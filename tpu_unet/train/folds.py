"""Cross-validation fold orchestration (reference ``main_main.py:177-257``).

Same seeded-shuffle + rotation scheme: one permutation drawn with the run
seed, rotated by the validation-set size per fold. Intended-semantics fixes
(documented, SURVEY.md §2.11): the validation split keeps its last element
(the reference's ``train_dataset[samp_tr:-1]`` silently drops one sample) and
augmentation stays live per epoch (the reference's fold path freezes each
sample's augmentation by materializing the dataset once per fold).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np

from tpu_unet.data.ingest import SegmentationData


def subset(data: SegmentationData, idx: np.ndarray, name_suffix: str = "") -> SegmentationData:
    return SegmentationData(
        images=data.images[idx],
        targets=data.targets[idx],
        crop_log_probs=None if data.crop_log_probs is None else data.crop_log_probs[idx],
        crop_pairs=data.crop_pairs,
        name=data.name + name_suffix,
    )


def fold_splits(
    n: int, folds: int, seed: int, val_fraction: float = 0.2
) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Yield (fold, train_indices, val_indices).

    Matches the reference bookkeeping: samp_tr/samp_val rounding with overflow
    guard (``main_main.py:178-182``), ``np.random.seed(SEED)`` shuffle
    (185-187), rotation of the order vector by samp_val per fold (240).
    """
    samp_tr = int(np.round((1.0 - val_fraction) * n))
    samp_val = int(np.round(val_fraction * n))
    while samp_tr + samp_val > n:
        samp_val -= 1
    rng = np.random.RandomState(seed)
    order = np.arange(n)
    rng.shuffle(order)
    for fold in range(folds):
        yield fold, order[:samp_tr].copy(), order[samp_tr:].copy()
        order = np.append(order[samp_val:], order[:samp_val])
