"""Tracked persists: cache bookkeeping for multi-stage jobs.

Library operators persist intermediates that are referenced several times
within one job (bucket frames, shingle arrays, channel candidates). Left
unreleased, those blocks accumulate across runs in a long-lived session
and strangle execution memory — back-to-back pipeline runs get
progressively slower as the cache evicts/thrashes. Every library persist
goes through `tracked_persist`, and top-level entry points call
`release_all()` when their output is safely materialized (checkpointed
stages re-read from storage, so dropping the cache is free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later `release_all()`."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count.

    Call from the top of the job graph once results are materialized.
    Safe to call repeatedly; only affects frames persisted through
    `tracked_persist` (user-level caches are untouched).
    """
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
    _TRACKED.clear()
    return n
