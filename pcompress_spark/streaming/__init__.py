"""Structured Streaming ingestion for the dedup engine."""
