"""Round-verification training run: full-width U-Net on the synthetic fixture
dataset, on the real TPU chip, distance-transform weight maps — demonstrates
the complete fused training path (augment + CC + EDT + weighted BCE + SGD)
converging end-to-end on real hardware.

Writes runs/synthetic_tpu/ (progress curves, checkpoints) and prints a final
JSON summary line.
"""

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
    TrainConfig,
)
from tpu_unet.data import synthetic_dataset
from tpu_unet.train import Trainer


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    t0 = time.time()
    data = synthetic_dataset(n_images=8, h=256, w=256, n_cells=5, crop=196,
                             seed=0)
    ds = DatasetConfig(name="synthetic", crop=196, metric="iou",
                       weight_mode="distance", goal=0.95, goal_direction="max")
    trainer = Trainer(
        ds,
        model_cfg=ModelConfig(compute_dtype="bfloat16"),
        train_cfg=TrainConfig(batch_size=2, checkpoint_every=25),
        aug_cfg=AugmentConfig(crop=196),
        loss_cfg=LossConfig(weight_mode="distance", max_objects=16),
        out_dir="runs/synthetic_tpu",
        verbose=True,
    )
    hist = trainer.fit(data, data, epochs=epochs)
    print(json.dumps({
        "epochs": epochs,
        "final_val_iou": hist["val_iou"][-1],
        "best_val_iou": max(hist["val_iou"]),
        "final_val_pe": hist["val_pe"][-1],
        "final_loss": hist["loss"][-1],
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
