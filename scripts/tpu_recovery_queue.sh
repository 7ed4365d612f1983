#!/bin/bash
cd /root/repo
for i in $(seq 1 70); do
  echo "[watch3] attempt $i $(date +%H:%M:%S)"
  if timeout 300 python -c "
import jax
import jax.numpy as jnp
float(jnp.zeros(()).sum())
print('TPU_UP')
" 2>&1 | grep -q TPU_UP; then
    echo "[watch3] TPU up at attempt $i $(date +%H:%M:%S)"
    timeout 1800 python bench.py > results/r3/bench_control2.json 2> results/r3/bench_control2.log
    echo "CTRL_EXIT=$?"
    timeout 2400 python bench.py --phase ab --skip-bf16 > results/r3/bench_phase_ab.json 2> results/r3/bench_phase_ab.log
    echo "PHASE_AB_EXIT=$?"
    timeout 3000 python scripts/tpu_phase_probe.py > results/r3/phase_probe.txt 2>&1
    echo "PHASE_PROBE_EXIT=$?"
    timeout 2400 python scripts/tpu_phase_train_ab.py > results/r3/phase_train_ab.txt 2>&1
    echo "TRAIN_AB_EXIT=$?"
    timeout 1500 python scripts/tpu_int4_probe.py > results/r3/int4_probe.txt 2>&1
    echo "INT4_EXIT=$?"
    timeout 1500 python scripts/tpu_bwd_attrib.py > results/r3/bwd_attrib.txt 2>&1
    echo "ATTRIB_EXIT=$?"
    exit 0
  fi
  sleep 240
done
echo "[watch3] gave up"
# Round-3 context: the pooled TPU went UNAVAILABLE ~21:00 and stayed down
# 7+ hours (backend init first failed fast, later hung ~300 s per attempt).
# This script is the queued hardware-measurement plan for the phase-packed
# work (serving A/B, probe, train A/B) plus the int4 and backward-attribution
# probes; it pings until the service recovers, then runs everything in
# sequence. Safe to re-run: every output lands in results/r3/ and the bench
# runs are health-gated.
