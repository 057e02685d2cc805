"""Incremental-ingest benchmark: batch classification vs corpus size.

The design claim of operators/incremental.py is CORPUS-INDEPENDENCE:
classifying a fixed batch costs ~O(batch + probed slice), not O(corpus).
This script measures the SAME batch against two corpus sizes and reports

  add_batch wall at corpus C and 2C     (should be ~flat)
  full pipeline rerun at C+B and 2C+B   (scales with corpus)
  speedup_vs_rerun at each scale        (grows with corpus)

Writes BENCH_INCR.json at the repo root.

Usage: python scripts/incr_bench.py [--corpus N] [--batch M] [--cpus C]
(corpus N is the LARGER corpus; the smaller one is N/2)
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

    total = corpus + batch
    all_path = f"/tmp/incr_input_{total}"
    if not os.path.exists(os.path.join(all_path, "_SUCCESS")):
        gen_pages_spark(spark, total, partitions=64).write.mode(
            "overwrite"
        ).parquet(all_path)
    pages = spark.read.parquet(all_path)
    n_buckets = max(2, total // batch)
    split = F.pmod(F.xxhash64("url"), F.lit(n_buckets))
    batch_df = pages.filter(split == 0).localCheckpoint()
    # same batch against half and full corpus (corpus split by a second
    # independent hash so both contain the batch's near-dup partners)
    corpus_full = pages.filter(split != 0).localCheckpoint()
    corpus_half = corpus_full.filter(
        F.pmod(F.xxhash64("url", F.lit(7)), F.lit(2)) == 0
    ).localCheckpoint()
    n_batch = batch_df.count()

    def run_scale(tag: str, corpus_df) -> dict:
        n_corpus = corpus_df.count()
        idx_dir = f"/tmp/incr_bench_idx_{tag}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        idx = IncrementalDedupIndex(spark, PipelineConfig(), idx_dir)
        t0 = time.time()
        idx.bootstrap(corpus_df)
        t_boot = time.time() - t0
        t0 = time.time()
        idx.add_batch(batch_df)
        idx.assignments().count()
        t_batch = time.time() - t0
        ckpt = f"/tmp/incr_bench_full_{tag}"
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.time()
        DedupPipeline(
            spark, PipelineConfig(), checkpoint_dir=ckpt, resume=False
        ).run(corpus_df.unionByName(batch_df)).count()
        t_full = time.time() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        return {
            "corpus_docs": n_corpus,
            "bootstrap_s": round(t_boot, 1),
            "add_batch_s": round(t_batch, 1),
            "batch_docs_per_sec": round(n_batch / t_batch, 1),
            "full_rerun_s": round(t_full, 1),
            "speedup_vs_rerun": round(t_full / t_batch, 2),
        }

    half = run_scale("half", corpus_half)
    full = run_scale("full", corpus_full)
    result = {
        "batch_docs": n_batch,
        "cpus": cpus,
        "at_half_corpus": half,
        "at_full_corpus": full,
        "add_batch_corpus_scaling": round(
            full["add_batch_s"] / half["add_batch_s"], 2
        ),
        "rerun_corpus_scaling": round(
            full["full_rerun_s"] / half["full_rerun_s"], 2
        ),
        "note": (
            "corpus-independence evidence: doubling the corpus should "
            "leave add_batch ~flat (scaling ~1.0) while the full rerun "
            "scales with corpus; at production corpus:batch ratios "
            "(10^12:10^9) the increment path's advantage is this gap "
            "compounded"
        ),
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "BENCH_INCR.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
