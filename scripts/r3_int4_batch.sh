#!/bin/bash
# Round-3 int4 hardware batch:
#   1. the serving A/B that decides the tier: phase-int8 vs phase-int4 in
#      ONE session (--phase ab4) at the default candidates
#   2. full-width quality gate: train the synthetic production model
#      (~310 s at r2 pace), then bf16 vs int8 vs int8-phase vs int4-phase
#      IoU on the synthetic eval set
# Sequential: the TPU is single-client. Outputs land in results/r3/.
cd /root/repo
timeout 3600 python bench.py --phase ab4 \
  > results/r3/bench_int4_ab.json 2> results/r3/bench_int4_ab.log
echo "AB4_EXIT=$?"
timeout 2400 python scripts/train_synthetic_tpu.py 100 \
  > results/r3/train_synthetic_r3.txt 2>&1
echo "TRAIN_EXIT=$?"
timeout 3000 python scripts/tpu_quant_quality.py \
  > results/r3/int4_quality.txt 2>&1
echo "QUALITY_EXIT=$?"
