"""One instrumented pipeline leg for perf attribution.

Runs the flagship pipeline once in THIS process at --cores over the
pre-written corpus (scaling_bench.gen_input layout), printing per-stage
lineage (wall + rows) and the candidate/edge row counts — the numbers
needed to attribute a wall-time change to pair volume vs stage cost.

Usage: python scripts/ab_leg.py --cores 8 --docs 100000 [--legacy]
       [--input /tmp/scale_input_100000]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcompress_spark.config import PipelineConfig  # noqa: E402
from pcompress_spark.pipeline import DedupPipeline  # noqa: E402
from pcompress_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[sys.argv.index("--cores") + 1]) if "--cores" in sys.argv else 8
    docs = int(sys.argv[sys.argv.index("--docs") + 1]) if "--docs" in sys.argv else 100000
    inp = (
        sys.argv[sys.argv.index("--input") + 1]
        if "--input" in sys.argv
        else f"/tmp/scale_input_{docs}"
    )
    cfg = PipelineConfig(fused_channels="--legacy" not in sys.argv)
    spark = get_spark(f"ab{cores}", master=f"local[{cores}]")
    spark.range(1000).selectExpr("sum(id)").collect()
    ckpt = tempfile.mkdtemp(prefix="ab_ckpt_")
    t0 = time.time()
    pages = spark.read.parquet(inp)
    pipe = DedupPipeline(spark, cfg, checkpoint_dir=ckpt, resume=False)
    rows = pipe.run(pages).count()
    wall = time.time() - t0
    print(f"== cores={cores} fused={cfg.fused_channels} wall={wall:.1f}s rows={rows}")
    for rec in pipe.ckpt.lineage():
        print("  " + json.dumps(rec))
    # edge count from the checkpointed table (metadata-only)
    print("  edges_rows:", spark.read.parquet(pipe.ckpt.path("edges")).count())
    print(
        "  candidates_rows:",
        spark.read.parquet(pipe.ckpt.path("candidates")).count(),
    )
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    main()
