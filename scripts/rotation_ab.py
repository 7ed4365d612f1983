"""A/B: bilinear vs cubic rotation interpolation in the augmentation pipeline
(VERDICT r1 item 7 — the reference uses scipy.rotate's order-3 default,
``data.py:116-117``; this build defaults to bilinear for the fused
single-gather warp).

Runs two otherwise-identical synthetic convergence runs (distance weights,
BASELINE config-3 mechanism) and prints a JSON comparison. Intended for the
real chip; also runs on CPU with smaller settings via --cpu.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpu = "--cpu" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    epochs = int(args[0]) if args else 60

    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tpu_unet.config import (
        AugmentConfig,
        DatasetConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
    )
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.train import Trainer

    data = synthetic_dataset(n_images=8, h=256, w=256, n_cells=5, crop=196,
                             seed=0)
    ds = DatasetConfig(name="synthetic", crop=196, metric="iou",
                       weight_mode="distance", goal=0.999,
                       goal_direction="max")
    results = {}
    for order in (1, 3):
        t0 = time.time()
        trainer = Trainer(
            ds,
            model_cfg=ModelConfig(compute_dtype="bfloat16",
                                  base_width=8 if cpu else 64),
            train_cfg=TrainConfig(batch_size=2, checkpoint_every=10 ** 9),
            aug_cfg=AugmentConfig(crop=196, rotate_order=order),
            loss_cfg=LossConfig(weight_mode="distance", max_objects=16),
            out_dir=f"runs/rotation_ab/order{order}",
            verbose=False,
        )
        hist = trainer.fit(data, data, epochs=epochs)
        results[f"order{order}"] = {
            "best_val_iou": max(hist["val_iou"]),
            "final_val_iou": hist["val_iou"][-1],
            "final_loss": hist["loss"][-1],
            "epoch_s": round((time.time() - t0) / (epochs + 1), 2),
        }
        print(json.dumps({f"order{order}": results[f"order{order}"]}),
              flush=True)
    b, c = results["order1"], results["order3"]
    print(json.dumps({
        "epochs": epochs,
        "bilinear": b,
        "cubic": c,
        "best_iou_delta_cubic_minus_bilinear":
            round(c["best_val_iou"] - b["best_val_iou"], 4),
        "cubic_epoch_overhead":
            round(c["epoch_s"] / max(b["epoch_s"], 1e-9) - 1.0, 3),
    }))


if __name__ == "__main__":
    main()
