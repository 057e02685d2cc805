"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32):

  dedup_minhash_lsh   MinHash-LSH candidates + exact-Jaccard verify (documents)
  dedup_simhash       SimHash hamming-ball + verify
  dedup_substring     winnowing anchors + exact-span verify
  dedup_clusters      LSH edges -> connected components labels
  embedding_topk      brute-force cosine top-5 (all vectors)
  embedding_ann_lsh   multi-table hyperplane-LSH ANN top-5
  join_agg_revenue    lineitem⋈orders⋈customer⋈nation revenue rollup
  pipeline_pages      END-TO-END dedup pipeline (sig -> LSH/simhash/winnow ->
                      verify -> CC) on synthetic Common-Crawl-style pages
                      (n scales with sf; the flagship 100TB-shaped workload).
                      The corpus parquet is pre-written OUTSIDE the timed
                      window — the docs/s is engine-only and directly
                      comparable to BENCH_SCALING's legs

Metric: total seconds over headline queries; `queries` has the breakdown;
`extra.pages_docs_per_sec` is the flagship throughput (docs/sec).

Every query runs `--reps N` times (default 3): `queries` carries the
MIN per query (the noise-robust statistic scaling_bench.py already uses),
`spread` carries {min, med, max, reps} so the artifact is self-interpreting
— single-shot numbers invited "regressed or noise?" questions every round
(r3 verdict task #8).

Usage: python bench.py [--pipeline-only] [--docs N] [--reps N]
                       [--json-out PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pcompress_spark import driver_queries as DQ  # noqa: E402
from pcompress_spark.config import PipelineConfig  # noqa: E402
from pcompress_spark.datagen import gen_pages_spark  # noqa: E402
from pcompress_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def prepare_pages_corpus(spark, n_docs: int, partitions: int) -> str:
    """Write the flagship corpus parquet ONCE (outside the timed window) so
    `pipeline_pages` measures the ENGINE (scan -> dedup -> clusters), the
    same window BENCH_SCALING uses — one comparable docs/s everywhere
    (r2 verdict: two windows for one flagship number invited confusion)."""
    path = f"/tmp/bench_pages_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen_pages_spark(spark, n_docs, partitions=partitions).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_pipeline_pages(spark, corpus_path: str, cfg: PipelineConfig | None = None) -> int:
    """Flagship workload: the production DedupPipeline (checkpointed,
    resumable — the same code path the driver and the golden tests grade)
    over the pre-written corpus, cold checkpoints."""
    import shutil
    import tempfile

    from pcompress_spark.pipeline import DedupPipeline

    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    try:
        pages = spark.read.parquet(corpus_path)
        pipe = DedupPipeline(
            spark, cfg or PipelineConfig(), checkpoint_dir=ckpt, resume=False
        )
        return pipe.run(pages).count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pipeline_only = "--pipeline-only" in sys.argv
    n_docs = None
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])
    json_out = None
    if "--json-out" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json-out") + 1]
    reps = int(os.environ.get("PCOMPRESS_BENCH_REPS", "3"))
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    reps = max(1, reps)

    sf = _sf_of(sf_dir)
    if n_docs is None:
        # flagship corpus scales with sf: sf0.1 -> 60k pages
        n_docs = max(2000, int(600_000 * sf)) if sf > 0 else 20000

    # some sandbox VMs deliver COLD anonymous pages at 0.01-0.4 GB/s
    # (host-side fault path + virtio-balloon free-page reporting); fault
    # the guest's memory in once so the engine runs on warm pages — see
    # pcompress_spark/warmup.py. No-op on healthy machines.
    from pcompress_spark.warmup import ensure_warm

    ensure_warm()

    spark = get_spark("bench", master=f"local[{cpus}]")
    # warm the JVM/codegen so per-query timings measure the engine
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}

    from pcompress_spark.cache import release_all

    def timed(name, fn):
        """Run fn `reps` times; record min (headline) + min/med/max
        (spread). Caches released between reps so each rep re-executes
        the full plan, not a cached result."""
        samples = []
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            samples.append(round(time.time() - t0, 3))
            release_all()
        samples.sort()
        timings[name] = samples[0]
        spread[name] = {
            "min": samples[0],
            "med": samples[len(samples) // 2],
            "max": samples[-1],
            "reps": reps,
        }
        return out

    if not pipeline_only:
        headline = [
            ("dedup_minhash_lsh", DQ.q_minhash_lsh_pairs),
            ("dedup_simhash", DQ.q_simhash_pairs),
            ("dedup_substring", DQ.q_substring_pairs),
            ("dedup_clusters", DQ.q_dedup_clusters),
            ("embedding_topk", DQ.q_embedding_topk),
            ("embedding_ann_lsh", DQ.q_embedding_ann_lsh),
            ("join_agg_revenue", DQ.q_join_agg_revenue),
        ]
        for name, fn in headline:
            timed(name, lambda fn=fn: fn(spark, sf_dir).count())

    # corpus generation is OUTSIDE the timed window (engine-only metric,
    # same window as BENCH_SCALING)
    corpus = prepare_pages_corpus(spark, n_docs, partitions=max(cpus * 2, 16))
    rows = timed("pipeline_pages", lambda: run_pipeline_pages(spark, corpus))
    # r>1 banding leg (VERDICT r3 task #6): b=10/r=2 is the production
    # higher-precision operating point — band hits are no longer signature
    # overlap, so candidates flow through the exact array-intersect
    # prefilter path. Recorded so the precision/recall trade has a bench
    # delta next to it (golden recall gate: tests/test_golden.py).
    if not pipeline_only:
        timed(
            "pipeline_pages_r2",
            lambda: run_pipeline_pages(
                spark, corpus, PipelineConfig(lsh_bands=10, lsh_rows=2)
            ),
        )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline dedup+ann+relational suite, total seconds "
                  "(min over reps per query)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": sf,
        "extra": {
            "pages_docs": n_docs,
            "pages_rows_out": rows,
            "pages_docs_per_sec": round(n_docs / timings["pipeline_pages"], 1),
            "cpus": cpus,
        },
    }
    line = json.dumps(result)
    print(line)
    if json_out:
        with open(json_out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
