"""BASELINE config 1 & 2 demos on the chip, one session:

1. ISBI-shaped: 512x512 EM-like frames, crop 388, class-balance weights,
   pixel-error metric (config 1);
2. PhC-shaped: 520x696 *rectangular* frames, crop 196, class-balance weights,
   IoU metric (config 2 — exercises the non-square ingest/eval path end to
   end on hardware).

Prints one JSON summary line per config.
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


def run(name, h, w, crop, metric, goal_dir, epochs):
    t0 = time.time()
    data = synthetic_dataset(n_images=8, h=h, w=w, n_cells=6, crop=crop,
                             seed=0, name=name)
    ds = DatasetConfig(name=name, crop=crop, metric=metric,
                       weight_mode="class_balance", goal=0.02 if metric ==
                       "pixel_error" else 0.95, goal_direction=goal_dir)
    tr = Trainer(ds, model_cfg=ModelConfig(compute_dtype="bfloat16"),
                 train_cfg=TrainConfig(batch_size=2, checkpoint_every=100,
                                       best_save_min_interval=10),
                 aug_cfg=AugmentConfig(crop=crop),
                 loss_cfg=LossConfig(weight_mode="class_balance"),
                 out_dir=f"/root/repo/runs/{name}", verbose=True)
    hist = tr.fit(data, data, epochs=epochs)
    print(json.dumps({
        "config": name,
        "epochs": epochs,
        "best_val_iou": max(hist["val_iou"]),
        "best_val_pe": min(hist["val_pe"]),
        "final_loss": hist["loss"][-1],
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    run("synthetic-isbi", 512, 512, 388, "pixel_error", "min", epochs)
    run("synthetic-phc", 520, 696, 196, "iou", "max", epochs)


if __name__ == "__main__":
    main()
