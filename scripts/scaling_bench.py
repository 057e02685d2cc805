"""Scaling evidence: same flagship job at N and 4N parallelism.

The north rule's two-cluster-size criterion is evidenced in this sandbox
by running the identical pipeline (same input, same config) at local[8]
and local[32] in separate processes (fresh JVM each) and reporting
throughput at both plus efficiency = (docs/sec@32 / docs/sec@8) / 4.

Writes BENCH_SCALING.json at the repo root.

Usage: python scripts/scaling_bench.py [--docs N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, docs: int) -> dict:
    """Run the flagship pipeline in a subprocess; returns timing info.

    Spark session startup is excluded from the measured window (the
    subprocess prints its own post-warmup timing) — we are measuring
    engine throughput, not JVM boot.
    """
    code = f"""
import json, time, sys
sys.path.insert(0, {REPO!r})
from pcompress_spark.session import get_spark
from bench import run_pipeline_pages
spark = get_spark("scale{cpus}", master="local[{cpus}]",
                  shuffle_partitions=max({cpus}, 16))
spark.range(1000).selectExpr("sum(id)").collect()
t0 = time.time()
rows = run_pipeline_pages(spark, {docs}, partitions=max({cpus} * 2, 16))
wall = time.time() - t0
print("SCALERESULT " + json.dumps({{"cpus": {cpus}, "rows": rows,
      "wall_s": round(wall, 2), "docs_per_sec": round({docs} / wall, 1)}}))
"""
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            rec = json.loads(line[len("SCALERESULT "):])
            rec["total_proc_s"] = round(time.time() - t0, 1)
            return rec
    raise RuntimeError(f"no result from cpus={cpus}: {out.stderr[-2000:]}")


def main() -> None:
    docs = 40000
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    r8 = run_at(8, docs)
    print(json.dumps(r8))
    r32 = run_at(32, docs)
    print(json.dumps(r32))
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {
        "docs": docs,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(r32["docs_per_sec"] / r8["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8 from N to 4N cores (north rule proxy)",
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
