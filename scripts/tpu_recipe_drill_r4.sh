#!/bin/bash
# VERDICT r3 item 1, remaining legs: (a) kill one fold mid-run and resume it
# via -sf, on hardware; (b) TESTING through the production --quant int8-phase
# path with TIFF export, from the recipe checkpoint it produced.
#
# Runs fold 4 only (-f 5 -sk 4) of the reference recipe on the synthetic
# fixture. SIGTERM (never SIGKILL — a killed TPU client's stale grant blocks
# the next claim ~7-10 min) lands mid-run once >=40 epochs are on disk; the
# trainer's preemption path checkpoints and exits cleanly; the -sf relaunch
# must resume from that epoch, not epoch 0.
#
# First execution lesson (results/r4/drill/): the 600 s wait ceiling raced a
# slow TPU claim — SIGTERM landed during epoch 0's compile and the resume was
# from epoch 0. The ceiling is now 30 min and the loop also exits if the
# training process dies first.
set -u
cd /root/repo
D=${1:-results/r4/drill2}
mkdir -p $D
FOLD=$D/models/DIC-C2DH-HeLa/fold4

echo "=== leg 1: start fold 4, SIGTERM mid-run ($(date +%H:%M:%S)) ==="
timeout 2400 python -m tpu_unet.cli -m TRAINING -d DIC-C2DH-HeLa --synthetic \
    -f 5 -sk 4 -s 0 --out-dir $D/models > $D/train_leg1.log 2>&1 &
PID=$!
echo $PID > /tmp/drill.pid
# wait for >=40 epochs of progress (claim + first compile can be 60-500 s)
for i in $(seq 1 360); do
  if ! kill -0 $PID 2>/dev/null; then echo "leg-1 process exited early"; break; fi
  n=$(wc -l < $FOLD/progress/loss.out 2>/dev/null || echo 0)
  if [ "$n" -ge 40 ]; then break; fi
  sleep 5
done
echo "epochs on disk at SIGTERM: $(wc -l < $FOLD/progress/loss.out 2>/dev/null || echo 0) ($(date +%H:%M:%S))"
kill -TERM $PID
wait $PID
echo "leg 1 exit: $? ; log tail:"
tail -5 $D/train_leg1.log

sleep 10
echo "=== leg 2: resume with -sf ($(date +%H:%M:%S)) ==="
timeout 2400 python -m tpu_unet.cli -m TRAINING -d DIC-C2DH-HeLa --synthetic \
    -f 5 -sk 4 -s 0 -sf --out-dir $D/models > $D/train_leg2.log 2>&1
echo "leg 2 exit: $?"
grep -i "resum" $D/train_leg2.log | head -3
tail -3 $D/train_leg2.log

sleep 10
echo "=== leg 3: TESTING through --quant int8-phase ($(date +%H:%M:%S)) ==="
timeout 1800 python -m tpu_unet.cli -m TESTING -d DIC-C2DH-HeLa --synthetic \
    -s 0 -n $FOLD/models/best --quant int8-phase > $D/test_leg3.log 2>&1
echo "leg 3 exit: $?"
tail -5 $D/test_leg3.log
echo "--- artifacts ---"
ls $FOLD/models/best_test 2>/dev/null
for f in test_iou.out test_pe.out; do
  echo "$f: $(cat $FOLD/models/best_test/$f 2>/dev/null)"
done
ls $FOLD/models/best_test/preds 2>/dev/null | head -3
