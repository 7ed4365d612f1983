#!/bin/bash
# Round-4 availability watcher: log when the pooled TPU answers.
cd /root/repo
for i in $(seq 1 90); do
  t0=$(date +%s)
  if timeout 300 python -c "
import jax, jax.numpy as jnp
float(jnp.zeros(()).sum())
print('TPU_UP')
" 2>&1 | grep -q TPU_UP; then
    echo "[watch-r4] TPU UP attempt $i $(date +%H:%M:%S) (claim $(( $(date +%s) - t0 ))s)"
    exit 0
  fi
  echo "[watch-r4] down attempt $i $(date +%H:%M:%S) (waited $(( $(date +%s) - t0 ))s)"
  sleep 180
done
echo "[watch-r4] gave up"
