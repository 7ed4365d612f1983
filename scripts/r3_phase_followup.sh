#!/bin/bash
# Round-3 follow-up hardware batch (after the phase verdicts landed):
#   1. int4 probe, fixed for the axon int4-at-boundary limitation
#   2. tile/batch sweep under the phase-int8 serving formulation (is
#      16x1188 still the optimum now that level 0 runs packed?)
#   3. gated train bench at the new phase default (creates the healthy
#      train record the gate will track)
#   4. gated default serving bench (creates the healthy 406-class record)
# Sequential: the TPU is single-client. Outputs land in results/r3/.
cd /root/repo
timeout 1500 python scripts/tpu_int4_probe.py > results/r3/int4_probe2.txt 2>&1
echo "INT4_2_EXIT=$?"
timeout 3000 python bench.py --phase int8 --skip-bf16 \
  --candidates "16x1188,16x1348,24x1188,16x1028,8x1604,32x1028" \
  > results/r3/bench_phase_tilesweep.json 2> results/r3/bench_phase_tilesweep.log
echo "SWEEP_EXIT=$?"
timeout 1800 python bench.py --mode train > results/r3/bench_train_phase.json \
  2> results/r3/bench_train_phase.log
echo "TRAIN_EXIT=$?"
timeout 1800 python bench.py > results/r3/bench_default_phase.json \
  2> results/r3/bench_default_phase.log
echo "DEFAULT_EXIT=$?"
