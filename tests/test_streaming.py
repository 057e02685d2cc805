"""Streaming ingestion: cross-batch identity dedup via the seen index."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcompress_spark import datagen  # noqa: E402
from pcompress_spark.streaming import ingest  # noqa: E402


def test_stream_ingest_dedups_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    seen = str(tmp_path / "seen")
    ckpt1 = str(tmp_path / "ck1")
    ckpt2 = str(tmp_path / "ck2")

    # batch 1: docs [0, 1000) — includes the exact-dup class [550, 700)
    pdf1 = datagen.gen_pages_pandas(1000)
    spark.createDataFrame(pdf1).write.mode("overwrite").parquet(landing)
    q = ingest.run_ingest(spark, landing, seen, ckpt1)
    q.awaitTermination(120)
    first_new = sum(n for n, _ in q._merge_stats)
    assert first_new == spark.read.parquet(seen).count()
    # exact-dup class shares text with a base doc -> fewer seen than docs
    assert first_new < 1000

    # batch 2: re-deliver the same docs plus fresh ones -> only fresh texts land
    pdf2 = datagen.gen_pages_pandas(100, start=2000)
    spark.createDataFrame(pdf2).write.mode("append").parquet(landing)
    q2 = ingest.run_ingest(spark, landing, seen, ckpt2)
    q2.awaitTermination(120)
    seen_df = spark.read.parquet(seen)
    n_seen = seen_df.count()
    assert n_seen == seen_df.select("text_sha").distinct().count()
    assert first_new < n_seen <= first_new + 100


def test_seen_index_is_shard_partitioned_and_pruned(spark, tmp_path):
    """The durable index is partitioned by shard=pmod(xxhash64(text_sha),N)
    and the per-batch anti-join reads only the batch's shards (partition
    pruning) — batch cost tracks the touched slice, not total history."""
    import os

    from pyspark.sql import functions as F

    landing = str(tmp_path / "landing")
    seen = str(tmp_path / "seen")
    pdf = datagen.gen_pages_pandas(300)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(landing)
    q = ingest.run_ingest(spark, landing, seen, str(tmp_path / "ck"))
    q.awaitTermination(120)

    # hive-style shard directories on disk
    shard_dirs = [d for d in os.listdir(seen) if d.startswith("shard=")]
    assert len(shard_dirs) > 1

    # a single-shard filter prunes the scan to that partition
    one = spark.read.parquet(seen).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan, plan[:800]


def test_statestore_ingest_dedups_across_batches(spark, tmp_path):
    """dropDuplicates with no watermark: the state store is the global
    index — re-delivered texts are dropped without reading `seen` at all,
    and the index survives restarts via the stream checkpoint."""
    landing = str(tmp_path / "landing")
    seen = str(tmp_path / "seen")
    ckpt = str(tmp_path / "ck")  # SAME checkpoint across restarts

    pdf1 = datagen.gen_pages_pandas(1000)
    spark.createDataFrame(pdf1).write.mode("overwrite").parquet(landing)
    q = ingest.run_ingest_statestore(spark, landing, seen, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(seen).count()
    assert 0 < first < 1000  # exact-dup class collapsed

    # restart with new files: only genuinely fresh texts land
    pdf2 = datagen.gen_pages_pandas(100, start=5000)
    spark.createDataFrame(pdf2).write.mode("append").parquet(landing)
    q2 = ingest.run_ingest_statestore(spark, landing, seen, ckpt)
    q2.awaitTermination(120)
    seen_df = spark.read.parquet(seen)
    assert seen_df.count() == seen_df.select("text_sha").distinct().count()
    assert first < seen_df.count() <= first + 100


def test_neardup_stream_matches_full_run(spark, pages_pdf, assignments_run,
                                         tmp_path):
    """Streaming near-dup ingestion (incremental index as the foreachBatch
    body): two micro-batch drops accrue EXACTLY the monolithic full-run
    assignments, and re-delivering every file (fresh stream checkpoint)
    changes nothing (idempotency under at-least-once)."""
    landing = str(tmp_path / "landing")
    index_dir = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")

    full_pdf, _ckpt, _pipe = assignments_run
    full = dict(zip(full_pdf["doc_id"], full_pdf["cluster_id"]))

    # drop 1 -> drain; drop 2 -> drain (same stream checkpoint: only the
    # new file is processed — streaming resume, not a full rescan)
    spark.createDataFrame(pages_pdf.iloc[:500]).coalesce(1).write.mode(
        "overwrite").parquet(landing)
    q = ingest.run_ingest_neardup(spark, landing, index_dir, ck)
    q.awaitTermination(600)
    spark.createDataFrame(pages_pdf.iloc[500:]).coalesce(1).write.mode(
        "append").parquet(landing)
    q2 = ingest.run_ingest_neardup(spark, landing, index_dir, ck)
    q2.awaitTermination(600)

    got = {r["doc_id"]: r["cluster_id"]
           for r in q2._index.assignments().collect()}
    assert len(got) == len(full)
    diff = {d: (c, full[d]) for d, c in got.items() if full[d] != c}
    assert not diff, f"{len(diff)} mismatches, e.g. {list(diff.items())[:5]}"

    # redelivery: fresh stream checkpoint reprocesses EVERY file; the
    # index must absorb it as a no-op
    q3 = ingest.run_ingest_neardup(spark, landing, index_dir,
                                   str(tmp_path / "ck_redeliver"))
    q3.awaitTermination(600)
    again = {r["doc_id"]: r["cluster_id"]
             for r in q3._index.assignments().collect()}
    assert again == got


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window (append mode, watermark-finalized) emits
    exactly the batch sessionize answer for sessions the watermark
    closed: real events in file 1, a far-future sentinel user in file 2
    advances the watermark past every real session."""
    import datetime as dt

    from pcompress_spark.streaming import ingest as ING

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, ts_min, user, val):
        return (i, t0 + dt.timedelta(minutes=ts_min), user, "click", val, "{}")

    real = [
        # user 1: two sessions (gap 45 > 30 between minute 10 and 55)
        ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0), ev(3, 55, 1, 3.0),
        # user 2: one session spanning a 29-minute gap (still merged)
        ev(4, 5, 2, 4.0), ev(5, 34, 2, 5.0),
    ]
    # two sentinel batches: emission in batch N uses the watermark from
    # batches < N, so sentinel 1 (+30 d) finalizes the real sessions and
    # sentinel 2 (+60 d) guarantees a batch runs AFTER that watermark
    # advanced (no reliance on a trailing no-data micro-batch).
    sentinels = [[ev(99, 60 * 24 * 30, 999, 0.0)],
                 [ev(100, 60 * 24 * 60, 999, 0.0)]]
    landing = str(tmp_path / "landing")
    schema = ING.EVENTS_SCHEMA
    spark.createDataFrame(real, schema).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    for s in sentinels:
        spark.createDataFrame(s, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    q = ING.run_sessionize_stream(
        spark, landing, watermark="2 hours", query_name="sess_test"
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_cents)
        for r in spark.sql(
            "SELECT * FROM sess_test WHERE user_id != 999"
        ).collect()
    }
    batch = ING.sessionize(spark.createDataFrame(real, schema))
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_cents)
        for r in batch.collect()
    }
    assert want == got
    # sanity on the batch shape itself
    by_user = {}
    for u, *_ in want:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {1: 2, 2: 1}


def test_stateful_sessionize_matches_builtin(spark, tmp_path):
    """The custom applyInPandasWithState sessionizer emits EXACTLY the
    built-in session_window's batch answer for watermark-closed sessions
    — same layout as the built-in streaming test (real file, then two
    sentinel batches advancing the watermark)."""
    import datetime as dt

    from pcompress_spark.streaming import ingest as ING
    from pcompress_spark.streaming import stateful as ST

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def ev(i, ts_min, user, val):
        return (i, t0 + dt.timedelta(minutes=ts_min), user, "click", val, "{}")

    real = [
        ev(1, 0, 1, 1.25), ev(2, 10, 1, 2.0), ev(3, 55, 1, 3.5),
        ev(4, 5, 2, 4.0), ev(5, 34, 2, 5.75),
        ev(6, 7, 3, 0.333),
        # null event values (r4 ADVICE crash case): F.sum skips the null
        # but n_events counts it (user 1 session 1); an ALL-null session
        # (user 4) must emit value_cents NULL, not 0
        ev(7, 12, 1, None),
        ev(8, 3, 4, None), ev(9, 20, 4, None),
    ]
    sentinels = [[ev(99, 60 * 24 * 30, 999, 0.0)],
                 [ev(100, 60 * 24 * 60, 999, 0.0)]]
    landing = str(tmp_path / "landing_st")
    schema = ING.EVENTS_SCHEMA
    spark.createDataFrame(real, schema).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    for s in sentinels:
        spark.createDataFrame(s, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    q = ST.run_sessionize_stateful_stream(
        spark, landing, watermark="2 hours", query_name="sess_custom"
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_cents)
        for r in spark.sql(
            "SELECT * FROM sess_custom WHERE user_id != 999"
        ).collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_cents)
        for r in ING.sessionize(spark.createDataFrame(real, schema)).collect()
    }
    assert want == got and len(want) == 5
    # the all-null-value session really exercised the null-sum path
    null_cents = [v for *_, v in want if v is None]
    assert len(null_cents) == 1
