"""Incremental-ingest benchmark: classify a daily increment vs re-running.

The 100-TB economics of operators/incremental.py: once a corpus is
bootstrapped, classifying a new batch should cost ~O(batch + touched
slice), not O(corpus). This script measures, on one machine:

  bootstrap N docs            (one-time full pipeline)
  add_batch M docs            (the daily-increment path)
  full rerun over N+M docs    (what the increment path replaces)

and reports batch-classification docs/s plus the speedup over the rerun.
Writes BENCH_INCR.json at the repo root.

Usage: python scripts/incr_bench.py [--corpus N] [--batch M] [--cpus C]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    corpus = 100_000
    batch = 10_000
    cpus = 32
    if "--corpus" in sys.argv:
        corpus = int(sys.argv[sys.argv.index("--corpus") + 1])
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])

    from pcompress_spark.warmup import ensure_warm

    ensure_warm()

    from pyspark.sql import functions as F

    from pcompress_spark.config import PipelineConfig
    from pcompress_spark.datagen import gen_pages_spark
    from pcompress_spark.operators.incremental import IncrementalDedupIndex
    from pcompress_spark.pipeline import DedupPipeline
    from pcompress_spark.session import get_spark

    spark = get_spark("incr-bench", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    # one corpus, deterministic split: the batch is the docs whose url
    # hashes into the top slice — same generator the scaling bench uses
    total = corpus + batch
    all_path = f"/tmp/incr_input_{total}"
    if not os.path.exists(os.path.join(all_path, "_SUCCESS")):
        gen_pages_spark(spark, total, partitions=64).write.mode(
            "overwrite"
        ).parquet(all_path)
    pages = spark.read.parquet(all_path)
    n_buckets = max(2, total // batch)
    split = F.pmod(F.xxhash64("url"), F.lit(n_buckets))
    corpus_df = pages.filter(split != 0).localCheckpoint()
    batch_df = pages.filter(split == 0).localCheckpoint()
    n_corpus, n_batch = corpus_df.count(), batch_df.count()

    idx_dir = "/tmp/incr_bench_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = IncrementalDedupIndex(spark, PipelineConfig(), idx_dir)

    t0 = time.time()
    idx.bootstrap(corpus_df)
    t_boot = time.time() - t0

    t0 = time.time()
    idx.add_batch(batch_df)
    idx.assignments().count()
    t_batch = time.time() - t0

    ckpt = "/tmp/incr_bench_full_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    DedupPipeline(
        spark, PipelineConfig(), checkpoint_dir=ckpt, resume=False
    ).run(pages).count()
    t_full = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)

    result = {
        "corpus_docs": n_corpus,
        "batch_docs": n_batch,
        "cpus": cpus,
        "bootstrap_s": round(t_boot, 1),
        "add_batch_s": round(t_batch, 1),
        "batch_docs_per_sec": round(n_batch / t_batch, 1),
        "full_rerun_s": round(t_full, 1),
        "speedup_vs_rerun": round(t_full / t_batch, 2),
        "note": (
            "add_batch cost tracks the batch + touched slice, not the "
            "corpus; at production corpus:batch ratios (10^12 : 10^9) the "
            "speedup is bounded by the probe's index-slice read, not by "
            "corpus size"
        ),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "BENCH_INCR.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
