#!/bin/bash
# Round-3 hardware batch (single TPU client — strictly sequential).
# Each python process pays its own session establishment; bound each step.
cd /root/repo
set -x
timeout 1200 python scripts/tpu_train_profile.py \
  > results/r3/train_profile.txt 2>&1
timeout 1800 python bench.py --mode train \
  > results/r3/bench_train_s1.json 2> results/r3/bench_train_s1.log
timeout 3600 python scripts/rotation_ab.py 60 \
  > results/r3/rotation_ab.json 2> results/r3/rotation_ab.log
timeout 1800 python bench.py \
  > results/r3/bench_infer_s1.json 2> results/r3/bench_infer_s1.log
timeout 1800 python bench.py --mode train \
  > results/r3/bench_train_s2.json 2> results/r3/bench_train_s2.log
echo BATCH_DONE
