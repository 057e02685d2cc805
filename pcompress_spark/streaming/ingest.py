"""Streaming ingestion — the analog of the reference's pipe mode.

The reference's `-p` pipe mode (pcompress.c:2404-2427) processes an
unbounded stdin stream through the same dedup machinery, accumulating the
global index across chunks. Spark-first shape: `readStream` over the
landing zone, event-time watermark on `warc_ts`, in-stream url dedup, and
`foreachBatch` merging each micro-batch into the checkpointed identity
index so re-fetched pages dedupe against everything already ingested —
the micro-batch loop IS the chunk loop, the `seen` table IS the global
index.

The fuzzy channels (MinHash/SimHash/winnow) stay batch jobs over the
ingested table (reference parity: its similarity index is also rebuilt
per run, not per pipe chunk).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from pcompress_spark.datagen import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of pages parquet drops (S3/HDFS landing zone at
    production scale; maxFilesPerTrigger bounds micro-batch size)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )


def dedup_stream(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """In-stream identity prep: event-time watermark + url dedup + keys.

    `dropDuplicates` under a watermark keeps state bounded — late
    re-crawls beyond the watermark age out of state (acceptable: they are
    caught by the cross-batch `seen` index in `merge_batch`).
    """
    return (
        pages.withWatermark("warc_ts", watermark)
        .dropDuplicates(["url"])
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("text_sha", F.sha2("text", 256))
    )


def merge_batch(
    batch: DataFrame, seen_dir: str
) -> tuple[int, int]:
    """foreachBatch body: anti-join the micro-batch against the persistent
    identity index, append only first-seen texts, return (new, dup) counts.

    The `seen` table is the durable global index (reference:
    `db_lookup_insert_s`, rabin/global/index.c:485-558) — lookup-insert
    becomes anti-join + append, serialized per micro-batch by Structured
    Streaming's exactly-once foreachBatch contract.
    """
    spark = batch.sparkSession
    batch = batch.select("url", "doc_id", "text_sha", "warc_ts").persist()
    total = batch.count()
    if os.path.exists(os.path.join(seen_dir, "_SUCCESS")) or (
        os.path.isdir(seen_dir) and any(
            f.endswith(".parquet") for f in os.listdir(seen_dir)
        )
    ):
        seen = spark.read.parquet(seen_dir)
        fresh = batch.join(
            seen.select("text_sha"), "text_sha", "left_anti"
        )
    else:
        fresh = batch
    # first occurrence within the batch wins (earliest doc_id — backward-ref
    # semantics, rabin_dedup.c:1606-1615)
    from pyspark.sql import Window

    w = Window.partitionBy("text_sha").orderBy("doc_id")
    fresh = (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_new = fresh.count()
    fresh.write.mode("append").parquet(seen_dir)
    batch.unpersist()
    return n_new, total - n_new


def run_ingest(
    spark: SparkSession,
    landing_dir: str,
    seen_dir: str,
    stream_ckpt: str,
    watermark: str = "1 hour",
):
    """Wire the stream: landing parquet -> dedup -> seen index. Returns the
    started StreamingQuery (availableNow: drain what exists, then stop —
    the batch-boundary mode the driver and tests use)."""
    stats: list[tuple[int, int]] = []

    def _each(batch: DataFrame, batch_id: int) -> None:
        stats.append(merge_batch(batch, seen_dir))

    q = (
        dedup_stream(read_pages_stream(spark, landing_dir), watermark)
        .writeStream.foreachBatch(_each)
        .option("checkpointLocation", stream_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q._merge_stats = stats  # test hook
    return q
