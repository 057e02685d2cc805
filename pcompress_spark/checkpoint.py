"""Durable stage checkpoints + per-stage lineage metrics (S7/S8/A4).

Reference analogs: the segcache spill file (rabin/global/index.c:335-453)
and ordered chunk writer + trailer commit (pcompress.c:2101-2153,
:2909-2917). Ours: each stage lands in a table; a run resumes by skipping
stages whose table already committed. On a real cluster the format is
Iceberg (atomic snapshot commit); the sandbox writes parquet directories,
whose `_SUCCESS` marker plays the role of the snapshot commit.

Lineage (metadata stream analog, meta_stream.c): one row per stage with
rows / bytes / dup_ratio / wall_ms, appended to `_lineage`.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        fmt: str = "parquet",
        resume: bool = True,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.fmt = fmt
        self.resume = resume
        os.makedirs(base_dir, exist_ok=True)
        self._lineage_path = os.path.join(base_dir, "_lineage.jsonl")

    # -- paths / existence ------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def clear(self, name: str | None = None) -> None:
        if name is None:
            shutil.rmtree(self.base_dir, ignore_errors=True)
            os.makedirs(self.base_dir, exist_ok=True)
        else:
            shutil.rmtree(self.path(name), ignore_errors=True)

    # -- save / load -------------------------------------------------------
    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def materialize(
        self,
        name: str,
        build,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Run `build()` unless `name` is already checkpointed; always return
        the checkpointed DataFrame (read back from storage, so downstream
        stages re-plan from a scan — lineage is truncated at every stage).
        """
        if self.resume and self.exists(name):
            return self.load(name)
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(self.path(name))
        wall_ms = int((time.time() - t0) * 1000)
        out = self.load(name)
        self._record(name, out, wall_ms, extra_metrics or {})
        return out

    def note(self, stage: str, wall_ms: int, rows: int = -1, **extra) -> None:
        """Record a sub-stage lineage row (no table of its own) — used for
        the in-memory intermediates (channels, prefilter, verify) so the
        per-stage wall budget is observable without extra barriers."""
        rec = {"stage": stage, "rows": rows, "wall_ms": wall_ms, **extra}
        with open(self._lineage_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    # -- lineage -----------------------------------------------------------
    def _record(
        self, stage: str, df: DataFrame, wall_ms: int, extra: dict
    ) -> None:
        rows = df.count()  # metadata-only count from parquet footers
        nbytes = 0
        for root, _, files in os.walk(self.path(stage)):
            nbytes += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".")
            )
        rec = {
            "stage": stage,
            "rows": rows,
            "bytes": nbytes,
            "wall_ms": wall_ms,
            **extra,
        }
        with open(self._lineage_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self._lineage_path):
            return []
        with open(self._lineage_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
