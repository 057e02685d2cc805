#!/bin/bash
# Round-4 measurement chain: re-certify every gate artifact against the
# round-4 code (fused prefilter, gated CC, incremental floor cut).
# Runs each bench sequentially on an otherwise-idle box; artifacts land
# at the repo root exactly where the round-3 versions live.
set -x
cd /root/repo
python scripts/incr_bench.py --corpus 100000 --batch 10000 \
    > /tmp/incr_bench_r4.log 2>&1
python scripts/multi_batch_check.py --docs 100000 --batches 10 \
    > /tmp/multibatch_r4.log 2>&1
python scripts/scaling_bench.py --docs 200000 --reps 3 --cores 2,8,32 \
    > /tmp/scaling_r4.log 2>&1
python bench.py --json-out /tmp/BENCH_r04_local.json \
    > /tmp/bench_r4.log 2>&1
echo DONE_ALL
