"""Ingest + on-device augmentation (reference data.py:23-137, 195-221)."""

import cv2 as cv
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.config import AugmentConfig
from tpu_unet.data import AugmentPipeline, synthetic_dataset
from tpu_unet.data.ingest import (
    binarize_gt,
    crop_distribution,
    preprocess_gt,
    square_crop,
)
from tpu_unet.data.synthetic import synthetic_instances


def _oracle_preprocess_gt(img):
    """Reference data.py:195-221 via cv2."""
    kernel = cv.getStructuringElement(cv.MORPH_RECT, (5, 5))
    mask_global = np.zeros(img.shape)
    for cls in np.unique(img):
        if cls == 0:
            continue
        mask_cls = np.zeros(img.shape)
        mask_cls[img == cls] = 255
        dilated = cv.dilate(mask_cls, kernel, iterations=2)
        mask_global += dilated - mask_cls
    gt = img - mask_global
    gt[gt < 0] = 0
    return gt, mask_global


@pytest.mark.parametrize("seed", [0, 1])
def test_preprocess_gt_matches_cv(seed):
    rng = np.random.RandomState(seed)
    inst = synthetic_instances(96, 96, 6, rng).astype(np.float64)
    got_gt, got_mask = preprocess_gt(inst)
    exp_gt, exp_mask = _oracle_preprocess_gt(inst)
    np.testing.assert_allclose(got_mask, exp_mask)
    np.testing.assert_allclose(got_gt, exp_gt)


def test_preprocess_gt_separates_touching_cells():
    inst = np.zeros((32, 32), np.int32)
    inst[4:16, 4:28] = 1
    inst[16:28, 4:28] = 2  # touching along row 16
    gt, _ = preprocess_gt(inst)
    b = binarize_gt(gt)
    # A background ridge must separate the two cells.
    assert (b[15:18, 10] == 0).any()
    n, _ = cv.connectedComponents((b > 0).astype(np.uint8), connectivity=4)
    assert n - 1 == 2


def test_crop_distribution_matches_reference_math():
    from scipy.stats import norm

    rng = np.random.RandomState(0)
    inst = synthetic_instances(128, 128, 4, rng)
    tgt = binarize_gt(preprocess_gt(inst)[0])[None]
    crop, skip = 64, 10
    log_probs, pairs = crop_distribution(tgt, crop, skip=skip)
    # Oracle: data.py:67-82.
    exp_pairs = [(ii, jj) for ii in range(0, 128 - crop, skip)
                 for jj in range(0, 128 - crop, skip)]
    assert [tuple(p) for p in pairs] == exp_pairs
    p = []
    for (ii, jj) in exp_pairs:
        x = np.mean(tgt[0, ii:ii + crop, jj:jj + crop]) / 255
        p.append(0 if (x < 0.1 or x > 0.9) else 10 * norm.pdf(x, loc=0.5, scale=0.05))
    p = np.asarray(p)
    p = np.ones(len(p)) / len(p) if p.sum() == 0 else p / p.sum()
    got = np.exp(log_probs[0])
    got[np.isneginf(log_probs[0])] = 0
    np.testing.assert_allclose(got, p, rtol=1e-4, atol=1e-7)


def test_crop_distribution_uniform_fallback():
    tgt = np.zeros((1, 100, 100), np.float32)  # no foreground -> all gated out
    log_probs, pairs = crop_distribution(tgt, 64)
    got = np.exp(log_probs[0])
    np.testing.assert_allclose(got, 1.0 / len(pairs), rtol=1e-5)


def test_square_crop():
    img = np.arange(6 * 10, dtype=np.float32).reshape(6, 10)
    gt = img.copy()
    si, sg = square_crop(img, gt)
    assert si.shape == (6, 6)
    np.testing.assert_array_equal(si, img[:, 2:8])


def test_synthetic_dataset_shapes():
    data = synthetic_dataset(n_images=3, h=128, w=128, crop=64, seed=1)
    assert data.images.shape == (3, 128, 128)
    assert data.targets.shape == (3, 128, 128)
    assert set(np.unique(data.targets)) <= {0.0, 255.0}
    assert data.crop_log_probs.shape[0] == 3
    # determinism
    data2 = synthetic_dataset(n_images=3, h=128, w=128, crop=64, seed=1)
    np.testing.assert_array_equal(data.images, data2.images)


def test_augment_pipeline_shapes_and_ranges():
    data = synthetic_dataset(n_images=4, h=256, w=256, crop=196, seed=0)
    aug = AugmentConfig(crop=196)
    assert aug.input_size == 380
    pipe = AugmentPipeline(aug)
    inp, gt = pipe(
        jnp.asarray(data.images), jnp.asarray(data.targets),
        jnp.asarray(data.crop_log_probs), jnp.asarray(data.crop_pairs),
        np.array([0, 1]), jax.random.PRNGKey(0),
    )
    assert inp.shape == (2, 380, 380, 1)
    assert gt.shape == (2, 196, 196)
    inp = np.asarray(inp)
    assert inp.min() >= 0.0 and inp.max() <= 1.0 + 1e-6
    assert np.isclose(inp.min(), 0.0) and np.isclose(inp.max(), 1.0)
    assert set(np.unique(np.asarray(gt))) <= {0, 1}
    # Foreground-balanced crops: supervision window should contain both classes.
    frac = np.asarray(gt).mean(axis=(1, 2))
    assert np.all(frac > 0.01) and np.all(frac < 0.99)


def test_augment_pipeline_deterministic_per_key():
    data = synthetic_dataset(n_images=2, h=160, w=160, crop=64, seed=3)
    pipe = AugmentPipeline(AugmentConfig(crop=64))
    args = (
        jnp.asarray(data.images), jnp.asarray(data.targets),
        jnp.asarray(data.crop_log_probs), jnp.asarray(data.crop_pairs),
        np.array([0, 1]),
    )
    a1, g1 = pipe(*args, jax.random.PRNGKey(7))
    a2, g2 = pipe(*args, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    b1, _ = pipe(*args, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(a1), np.asarray(b1))
