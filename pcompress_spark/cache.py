"""Tracked persists: scoped cache bookkeeping for multi-stage jobs.

Library operators persist intermediates that are referenced several times
within one job (bucket frames, shingle arrays, channel candidates). Left
unreleased, those blocks accumulate across runs in a long-lived session
and strangle execution memory — back-to-back pipeline runs get
progressively slower as the cache evicts/thrashes.

Tracking is *scoped*: `tracked_persist` registers the frame with the
innermost active `CacheScope` (or a process-default scope when none is
active), and each scope unpersists only its own frames on exit. Two jobs
sharing a session therefore never release each other's persisted
intermediates (a DedupPipeline run cannot evict an in-flight embedding
job's norm frames, and vice versa).

Thread note: scope registration is a GIL-atomic list append, so worker
threads spawned inside a scope (e.g. the pipeline's concurrent candidate
channels) register with the scope that was active when they started.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT: list[DataFrame] = []
_STACK: list[list[DataFrame]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register with the innermost CacheScope (or the default
    scope) for a later release."""
    df = df.persist()
    (_STACK[-1] if _STACK else _DEFAULT).append(df)
    return df


def _release(frames: list[DataFrame]) -> int:
    n = len(frames)
    for df in frames:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
    frames.clear()
    return n


class CacheScope:
    """Context manager owning every tracked_persist made while it is the
    innermost scope. `release()` may be called early (e.g. to free channel
    caches before a memory-heavy later stage); exit releases the rest."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def __enter__(self) -> "CacheScope":
        _STACK.append(self._frames)
        return self

    def release(self) -> int:
        return _release(self._frames)

    def __exit__(self, *exc) -> None:
        if self._frames in _STACK:
            _STACK.remove(self._frames)
        self.release()


def release_all() -> int:
    """Release frames tracked in the process-default scope (persists made
    outside any CacheScope — e.g. one-shot driver queries). Scoped frames
    are owned by their scope and are NOT touched."""
    return _release(_DEFAULT)
