"""Training-data-pipeline analysis operators (embeddings, multimodal).

These extend the dedup engine with the operations a large-scale
training-data pipeline needs beyond the reference's own operator set:
similarity search over embedding columns and multimodal (binary payload)
plumbing. Text analysis lives in pcompress_spark.functions.text.
"""
