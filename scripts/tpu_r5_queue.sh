#!/bin/bash
# Round-5 hardware queue: ping until the pooled TPU service is up, then run
# the round's measurements in priority order (VERDICT r4 items 1-7).
# Everything lands in results/r5/; every run is bounded by timeout; nothing
# is ever SIGKILLed mid-claim by us (timeout sends SIGTERM first).
cd /root/repo
mkdir -p results/r5
for i in $(seq 1 90); do
  echo "[r5queue] attempt $i $(date +%H:%M:%S)"
  if timeout 300 python -c "
import jax
import jax.numpy as jnp
float(jnp.zeros(()).sum())
print('TPU_UP')
" 2>&1 | grep -q TPU_UP; then
    echo "[r5queue] TPU up at attempt $i $(date +%H:%M:%S)"
    # 1. the reworked driver bench, default workload -> the round's gated
    #    record (item 1's "done" criterion); also populates .jax_cache
    timeout 1700 python bench.py > results/r5/bench_default_r5.json 2> results/r5/bench_default_r5.log
    echo "BENCH_EXIT=$? $(date +%H:%M:%S)"
    # 2. persistent-compilation-cache probe, TWO fresh processes (item 2):
    #    run2's compile time answers whether the cache hits across processes
    timeout 1200 python scripts/tpu_compile_cache_probe.py > results/r5/cache_probe_run1.txt 2>&1
    echo "CACHE1_EXIT=$? $(date +%H:%M:%S)"
    timeout 1200 python scripts/tpu_compile_cache_probe.py > results/r5/cache_probe_run2.txt 2>&1
    echo "CACHE2_EXIT=$? $(date +%H:%M:%S)"
    # 2b. bench again: if the cache works, this measures the real-workload
    #     compile saving (compare compile+first-run lines vs run 1's log)
    timeout 1700 python bench.py > results/r5/bench_default_r5b.json 2> results/r5/bench_default_r5b.log
    echo "BENCH2_EXIT=$? $(date +%H:%M:%S)"
    # 3. gated train records: batch 2 (reference constant) + batch 8 (the
    #    recommended operating point, item 5)
    timeout 1500 python bench.py --mode train > results/r5/bench_train_b2.json 2> results/r5/bench_train_b2.log
    echo "TRAINB2_EXIT=$? $(date +%H:%M:%S)"
    timeout 1500 python bench.py --mode train --train-batch 8 > results/r5/bench_train_b8.json 2> results/r5/bench_train_b8.log
    echo "TRAINB8_EXIT=$? $(date +%H:%M:%S)"
    # 4. serving engine end-to-end: kernel vs evaluate() in one window (item 6)
    timeout 2400 python scripts/tpu_serving_e2e.py > results/r5/serving_e2e.txt 2>&1
    echo "E2E_EXIT=$? $(date +%H:%M:%S)"
    # 5. 5-fold recipe on the n=10 fixture -> distinct-fold headline (item 4)
    timeout 5400 python -m tpu_unet.cli -m TRAINING -d DIC-C2DH-HeLa --synthetic -f 5 -s 0 \
        --out-dir results/r5/recipe/models > results/r5/recipe_train.log 2>&1
    echo "RECIPE_EXIT=$? $(date +%H:%M:%S)"
    # 6. batch-4 train pathology attribution (item 7)
    timeout 3600 python scripts/tpu_batch4_attrib.py > results/r5/batch4_attrib.txt 2>&1
    echo "B4_EXIT=$? $(date +%H:%M:%S)"
    echo "[r5queue] all done $(date +%H:%M:%S)"
    exit 0
  fi
  sleep 180
done
echo "[r5queue] gave up"
