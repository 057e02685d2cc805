"""Long-run incremental ingest check: many batches, one truth.

Ingests a corpus as a sequence of batches through the incremental index
(with a mid-sequence compact()), then runs the monolithic pipeline over
the same corpus and asserts LABEL-EXACT parity. Reports per-batch wall
times — the curve should stay ~flat as the index grows, the property the
10^12-doc deployment depends on.

Writes BENCH_MULTIBATCH.json at the repo root; exits non-zero on any
parity mismatch (this is a check, not just a benchmark).

`--queue-depth Q` (default 1) models ingest falling behind: batches
still ARRIVE one at a time, but the index drains up to Q pending batches
per classification action via add_batches() — one per-batch floor paid
per drain instead of per batch. Parity is asserted against the
monolithic run in every mode (coalescing changes cost, never labels).

Usage: python scripts/multi_batch_check.py [--docs N] [--batches K]
       [--cpus C] [--queue-depth Q]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    docs = 100_000
    batches = 10
    cpus = 32
    queue_depth = 1
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    if "--batches" in sys.argv:
        batches = int(sys.argv[sys.argv.index("--batches") + 1])
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    if "--queue-depth" in sys.argv:
        queue_depth = int(sys.argv[sys.argv.index("--queue-depth") + 1])

    from pcompress_spark.warmup import ensure_warm

    ensure_warm()

    from pyspark.sql import functions as F

    from pcompress_spark.config import PipelineConfig
    from pcompress_spark.datagen import gen_pages_spark
    from pcompress_spark.operators.incremental import IncrementalDedupIndex
    from pcompress_spark.pipeline import DedupPipeline
    from pcompress_spark.session import get_spark

    spark = get_spark("multibatch", master=f"local[{cpus}]")
    spark.range(1000).selectExpr("sum(id)").collect()

    path = f"/tmp/mb_input_{docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        gen_pages_spark(spark, docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
    pages = spark.read.parquet(path)
    bucket = F.pmod(F.xxhash64("url"), F.lit(batches))

    idx_dir = "/tmp/mb_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    idx = IncrementalDedupIndex(spark, PipelineConfig(), idx_dir)

    walls = []
    queue: list = []
    queued_ids: list[int] = []

    def _drain():
        if not queue:
            return
        n = sum(p.count() for p in queue)
        t0 = time.time()
        idx.add_batches(list(queue))
        walls.append({
            "batches": list(queued_ids), "docs": n,
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(walls[-1]), flush=True)
        queue.clear()
        queued_ids.clear()

    for b in range(batches):
        part = pages.filter(bucket == b).localCheckpoint()
        n = part.count()
        if b == 0:
            t0 = time.time()
            idx.bootstrap(part)
            walls.append({"batches": [0], "docs": n,
                          "wall_s": round(time.time() - t0, 1)})
            print(json.dumps(walls[-1]), flush=True)
        else:
            queue.append(part)
            queued_ids.append(b)
            if len(queue) >= queue_depth:
                _drain()
        if b == batches // 2:
            _drain()  # compact() needs no in-flight batches
            t0 = time.time()
            folded = idx.compact()
            print(json.dumps({"compact_after_batch": b, "folded": folded,
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
    _drain()

    incr = {r["doc_id"]: r["cluster_id"]
            for r in idx.assignments().collect()}

    ckpt = "/tmp/mb_full_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    full_df = DedupPipeline(
        spark, PipelineConfig(), checkpoint_dir=ckpt, resume=False
    ).run(pages)
    full = {r["doc_id"]: r["cluster_id"] for r in full_df.collect()}
    t_full = round(time.time() - t0, 1)
    shutil.rmtree(ckpt, ignore_errors=True)

    diff = {d: (c, full.get(d)) for d, c in incr.items() if full.get(d) != c}
    result = {
        "docs": docs,
        "queue_depth": queue_depth,
        "batches": walls,
        "incremental_total_s": round(sum(w["wall_s"] for w in walls), 1),
        "monolithic_s": t_full,
        "parity": not diff and len(incr) == len(full),
        "mismatches": len(diff),
        "clusters": len(set(full.values())),
    }
    line = json.dumps(result)
    print(line)
    out = ("BENCH_MULTIBATCH.json" if queue_depth == 1
           else f"BENCH_MULTIBATCH_Q{queue_depth}.json")
    with open(os.path.join(REPO, out), "w") as fh:
        fh.write(line + "\n")
    if diff or len(incr) != len(full):
        print(f"PARITY FAIL: {len(diff)} mismatches, "
              f"{len(incr)} vs {len(full)} rows", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
