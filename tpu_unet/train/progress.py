"""Per-epoch progress curves, same artifact contract as the reference
(``trainer.py:178-183``): six flat files rewritten each epoch under
``<fold_dir>/progress/`` — train/val IoU, train/val pixel error, train/val
loss — via ``np.savetxt``-compatible formatting."""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

FILES = {
    "train_iou": "train_eval_iou.out",
    "train_pe": "train_eval_pe.out",
    "val_iou": "val_eval_iou.out",
    "val_pe": "val_eval_pe.out",
    "loss": "loss.out",
    "loss_val": "loss_val.out",
}


class ProgressWriter:
    def __init__(self, fold_dir: str):
        self.progress_dir = os.path.join(fold_dir, "progress")
        os.makedirs(self.progress_dir, exist_ok=True)
        self.history: Dict[str, List[float]] = {k: [] for k in FILES}

    def append(self, **values: float) -> None:
        for key, val in values.items():
            if key not in self.history:
                raise KeyError(f"unknown progress key {key!r}")
            self.history[key].append(float(val))
        for key, fname in FILES.items():
            np.savetxt(os.path.join(self.progress_dir, fname),
                       np.asarray(self.history[key]))
