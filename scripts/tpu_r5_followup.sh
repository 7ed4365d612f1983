#!/bin/bash
# Round-5 follow-up hardware legs (run after tpu_r5_queue.sh drains):
#   1. serving e2e RE-measurement through the fused evaluate_batch path
#      (before/after for the r5 engine-overhead fix, same probe script)
#   2. one more default bench run with the scan-length-ladder code: lands
#      another gated record AND warms the scan-12 int8 cache entry the
#      driver's BENCH_r05 run will trace
cd /root/repo
mkdir -p results/r5
timeout 2400 python scripts/tpu_serving_e2e.py --out results/r5/serving_e2e_fused.json \
    > results/r5/serving_e2e_fused.txt 2>&1
echo "E2E_FUSED_EXIT=$? $(date +%H:%M:%S)"
timeout 1700 python bench.py > results/r5/bench_default_r5c.json 2> results/r5/bench_default_r5c.log
echo "BENCH3_EXIT=$? $(date +%H:%M:%S)"
echo "[r5followup] done $(date +%H:%M:%S)"
