"""Fold orchestration vs the reference's bookkeeping (main_main.py:177-257)."""

import numpy as np

from tpu_unet.data import synthetic_dataset
from tpu_unet.train.folds import fold_splits, subset


def _reference_orders(n, folds, seed, val_per=0.2):
    """Re-derive the reference's order bookkeeping (main_main.py:178-240)."""
    samp_tr = int(np.round((1 - val_per) * n))
    samp_val = int(np.round(val_per * n))
    while samp_tr + samp_val > n:
        samp_val -= 1
    np.random.seed(seed)
    order = np.arange(n)
    np.random.shuffle(order)
    outs = []
    for _ in range(folds):
        outs.append(order.copy())
        order = np.append(order[samp_val:], order[0:samp_val])
    return samp_tr, samp_val, outs


def test_fold_splits_match_reference_rotation():
    n, folds, seed = 23, 5, 7
    samp_tr, samp_val, orders = _reference_orders(n, folds, seed)
    for (fold, tr, va), order in zip(fold_splits(n, folds, seed), orders):
        np.testing.assert_array_equal(tr, order[:samp_tr])
        # Reference would use order[samp_tr:-1] (drops one sample,
        # SURVEY.md §2.11); we keep the full tail.
        np.testing.assert_array_equal(va, order[samp_tr:])
        assert len(set(tr) & set(va)) == 0
        assert len(tr) + len(va) == n


def test_fold_splits_cover_all_samples_across_folds():
    n, folds = 20, 5
    val_sets = []
    for _, _, va in fold_splits(n, folds, seed=0):
        val_sets.append(set(va.tolist()))
    # With val=20% and 5 folds the rotation makes validation sets disjoint
    # and jointly covering.
    union = set().union(*val_sets)
    assert union == set(range(n))
    assert sum(len(v) for v in val_sets) == n


def test_subset_slices_all_fields():
    data = synthetic_dataset(n_images=5, h=96, w=96, n_cells=2, crop=64, seed=0)
    sub = subset(data, np.array([0, 2, 4]))
    assert len(sub) == 3
    np.testing.assert_array_equal(sub.images[1], data.images[2])
    np.testing.assert_array_equal(sub.crop_log_probs[2], data.crop_log_probs[4])
    assert sub.crop_pairs is data.crop_pairs
