"""Round-verification training run: full-width U-Net on the synthetic fixture
dataset, on the real TPU chip, distance-transform weight maps — demonstrates
the complete fused training path (augment + CC + EDT + weighted BCE + SGD)
converging end-to-end on real hardware.

Writes runs/synthetic_tpu/ (progress curves, checkpoints) and prints a final
JSON summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_unet.config import (
    AugmentConfig,
    DatasetConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from tpu_unet.data import synthetic_dataset
from tpu_unet.train import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=60)
    ap.add_argument("--phase-level0", action="store_true",
                    help="train with the phase-packed level-0 formulation "
                         "(the production default since the r3 A/B)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=2,
                    help="batch size (2 = the reference constant; the r4 "
                         "batch sweep measured the samples/s optimum at 8 — "
                         "results/r4/train_batch_sweep.txt)")
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="initial LR (scale with batch when departing from "
                         "the reference's batch 2)")
    args = ap.parse_args()
    epochs = args.epochs
    out_dir = args.out or ("runs/synthetic_tpu_phase" if args.phase_level0
                           else "runs/synthetic_tpu")
    t0 = time.time()
    data = synthetic_dataset(n_images=8, h=256, w=256, n_cells=5, crop=196,
                             seed=0)
    ds = DatasetConfig(name="synthetic", crop=196, metric="iou",
                       weight_mode="distance", goal=0.95, goal_direction="max")
    trainer = Trainer(
        ds,
        model_cfg=ModelConfig(compute_dtype="bfloat16",
                              phase_level0=args.phase_level0),
        train_cfg=TrainConfig(batch_size=args.batch, checkpoint_every=25,
                              optim=OptimConfig(lr=args.lr)),
        aug_cfg=AugmentConfig(crop=196),
        loss_cfg=LossConfig(weight_mode="distance", max_objects=16),
        out_dir=out_dir,
        verbose=True,
    )
    hist = trainer.fit(data, data, epochs=epochs)
    print(json.dumps({
        "epochs": epochs,
        "phase_level0": args.phase_level0,
        "final_val_iou": hist["val_iou"][-1],
        "best_val_iou": max(hist["val_iou"]),
        "final_val_pe": hist["val_pe"][-1],
        "final_loss": hist["loss"][-1],
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
