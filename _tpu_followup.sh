#!/bin/bash
# Fire-when-tunnel-returns TPU tasks (run from /root/repo):
# 1. headline bench  2. grad-accum re-measure (strided)  3. train trace artifact
set -x
cd /root/repo
CCVPE_BENCH_INIT_TIMEOUT=600 timeout 2400 python bench.py 2>&1 | tail -2
CCVPE_TRAIN_BENCH_REMAT=encoder CCVPE_TRAIN_BENCH_ACCUM=2 \
  timeout 3000 python benchmarks/train_bench.py VIGOR 256 bfloat16 2>&1 | tail -4
timeout 3000 python benchmarks/trace_eval.py --mode train --batch 128 \
  --remat encoder --iters 3 --memory --top 30 \
  --logdir /tmp/tpu_train_trace_r3 --json_out benchmarks/TRAIN_TRACE.json 2>&1 | tail -40
