#!/bin/bash
# Batch-8 convergence defense (results/r4/README.md §7): the r4 batch sweep
# measured the samples/s optimum at batch 8 (+57% over the reference's
# batch 2, train_batch_sweep.txt §4); this run defends that recommendation
# with QUALITY evidence — equal sample budget (n=8 fixture: batch 2 = 4
# steps/epoch, batch 8 = 1 step/epoch), linear LR scaling (1e-4 -> 4e-4),
# 100 epochs, the production phase-packed level 0, back-to-back on the same
# chip (convergence is deterministic math — window draws only move wall
# time, not the IoU trajectory).
set -u
cd /root/repo
D=results/r4
echo "=== arm 1: batch 2, lr 1e-4 (reference constants) ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/train_synthetic_tpu.py 100 --phase-level0 \
    --batch 2 --lr 1e-4 --out runs/r4_conv_b2 > $D/conv_b2.log 2>&1
echo "arm 1 exit: $?"; tail -1 $D/conv_b2.log
echo "=== arm 2: batch 8, lr 4e-4 (linear scaling) ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/train_synthetic_tpu.py 100 --phase-level0 \
    --batch 8 --lr 4e-4 --out runs/r4_conv_b8 > $D/conv_b8.log 2>&1
echo "arm 2 exit: $?"; tail -1 $D/conv_b8.log
