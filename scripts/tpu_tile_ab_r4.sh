#!/bin/bash
# 16x1268 vs 16x1348 confirming A/B (ADVICE r3 item 2 / results/r3 README
# "queued round 4"): the r3 reversed-order sweep saw 16x1268 at 396.4 once
# (normal roundtrip) vs a normalized ~388 for 1348 — one sample, never
# A/B'd. Two bench.py sweep runs in OPPOSITE orders cancel within-session
# drift; each run measures both tiles in ONE session (phase-int8).
set -u
cd /root/repo
mkdir -p results/r4
echo "=== order A: 1268 first ($(date +%H:%M:%S)) ==="
timeout 1800 python bench.py --skip-bf16 --phase int8 \
    --candidates 16x1268,16x1348 \
    > results/r4/tile_ab_orderA.json 2> results/r4/tile_ab_orderA.log
echo "exit $? ; $(cat results/r4/tile_ab_orderA.json)"
sleep 20
echo "=== order B: 1348 first ($(date +%H:%M:%S)) ==="
timeout 1800 python bench.py --skip-bf16 --phase int8 \
    --candidates 16x1348,16x1268 \
    > results/r4/tile_ab_orderB.json 2> results/r4/tile_ab_orderB.log
echo "exit $? ; $(cat results/r4/tile_ab_orderB.json)"
