"""Loss / metric / weight-map golden tests against torch + cv2 oracles.

The oracles re-derive the reference's math (trainer.py:63-75,
functions.py:7-117, 150-213) with the same libraries the reference uses —
bit-faithfulness targets from BASELINE.json."""

import cv2 as cv
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tpu_unet.losses import (
    class_balance,
    evaluation_metrics,
    iou,
    one_hot_targets,
    pixel_error,
    weighted_bce_with_logits,
    weighted_map,
)


def _rand_labels(b, h, w, seed=0, p=0.4):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, h, w) < p).astype(np.int64)


def _blob_labels(b, h, w, n_blobs, seed=0):
    rng = np.random.RandomState(seed)
    out = np.zeros((b, h, w), np.int64)
    yy, xx = np.mgrid[0:h, 0:w]
    for bi in range(b):
        for _ in range(n_blobs):
            cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
            r = rng.randint(3, 8)
            out[bi][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1
    return out


# ------------------------------------------------------------------ BCE


def _torch_bce(logits_nhwc, labels, weights, parity):
    """Oracle: torch BCEWithLogitsLoss exactly as the reference calls it
    (trainer.py:63-75)."""
    preds = torch.tensor(np.moveaxis(logits_nhwc, -1, 1))  # NCHW
    labels_t = torch.tensor(labels)
    ll = torch.empty_like(preds)
    ll[:, 0] = 1 - labels_t
    ll[:, 1] = labels_t
    w = torch.tensor(weights)
    if not parity:
        w = w[:, None]  # intended: [B,1,H,W]
    crit = torch.nn.BCEWithLogitsLoss(weight=w)
    return crit(preds, ll).item()


@pytest.mark.parametrize("parity", [False, True])
def test_weighted_bce_matches_torch(parity):
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 16, 16, 2).astype(np.float32) * 3
    labels = _rand_labels(2, 16, 16)
    weights = rng.rand(2, 16, 16).astype(np.float32) * 5
    expected = _torch_bce(logits, labels, weights, parity)
    got = float(
        weighted_bce_with_logits(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
            broadcast="parity" if parity else "intended",
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_parity_broadcast_requires_square_batch():
    with pytest.raises(ValueError):
        weighted_bce_with_logits(
            jnp.zeros((3, 4, 4, 2)), jnp.zeros((3, 4, 4), jnp.int32),
            jnp.ones((3, 4, 4)), broadcast="parity",
        )


def test_one_hot_targets():
    labels = jnp.asarray([[[0, 1], [1, 0]]])
    oh = np.asarray(one_hot_targets(labels))
    np.testing.assert_array_equal(oh[..., 0], 1 - np.asarray(labels))
    np.testing.assert_array_equal(oh[..., 1], np.asarray(labels))


# ------------------------------------------------------------------ metrics


def test_iou_matches_reference_math():
    pred = _rand_labels(1, 32, 32, seed=1)[0]
    label = _rand_labels(1, 32, 32, seed=2)[0]
    inter = np.logical_and(pred, label).sum()
    union = np.logical_or(pred, label).sum()
    got = float(iou(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, inter / union, rtol=1e-6)


def test_pixel_error_matches_reference_math():
    pred = _rand_labels(1, 32, 32, seed=3)[0]
    label = _rand_labels(1, 32, 32, seed=4)[0]
    expected = np.sum(np.abs(pred - label)) / pred.size
    got = float(pixel_error(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_evaluation_metrics_bundle():
    pred = _rand_labels(1, 16, 16, seed=5)[0]
    label = _rand_labels(1, 16, 16, seed=6)[0]
    got = np.asarray(evaluation_metrics(jnp.asarray(pred), jnp.asarray(label)))
    assert got.shape == (2,)
    np.testing.assert_allclose(got[0], float(iou(jnp.asarray(pred), jnp.asarray(label))))


# ------------------------------------------------------------------ weights


def _oracle_class_balance(gt):
    """functions.py:82-117 semantics for binary gt with both classes present."""
    w = np.ones(gt.shape, np.float64)
    vals, counts = np.unique(gt, return_counts=True)
    for pos, v in enumerate(vals):
        w[gt == v] = counts[1] / counts[pos]
    return w


def test_class_balance_matches_reference():
    gt = _rand_labels(3, 24, 24, seed=7)
    got = np.asarray(class_balance(jnp.asarray(gt)))
    for b in range(3):
        np.testing.assert_allclose(got[b], _oracle_class_balance(gt[b]), rtol=1e-5)


def test_class_balance_single_class_degrades_to_ones():
    # Reference IndexErrors here (SURVEY.md §2.8); we degrade to all-ones.
    gt = np.zeros((1, 8, 8), np.int64)
    np.testing.assert_array_equal(np.asarray(class_balance(jnp.asarray(gt))), 1.0)
    gt = np.ones((1, 8, 8), np.int64)
    np.testing.assert_array_equal(np.asarray(class_balance(jnp.asarray(gt))), 1.0)


def _oracle_weighted_map(gt, w0=20.0, sig2=25.0, int_wc=False):
    """functions.py:7-78 semantics via cv2 (float w_c unless int_wc)."""
    w_c = _oracle_class_balance(gt)
    if int_wc:
        w_c = np.trunc(w_c)
    n_obj, objects = cv.connectedComponents(gt.astype(np.uint8), connectivity=4)
    maps = np.zeros((n_obj - 1, *gt.shape))
    for ii in range(n_obj - 1):
        plane = (objects == ii + 1).astype(np.uint8)
        maps[ii] = cv.distanceTransform(
            (plane - 1).astype(np.uint8), cv.DIST_L2, maskSize=0
        )
    maps = np.sort(maps, 0)
    d1 = maps[0]
    d2 = maps[1] if maps.shape[0] > 1 else 0.0
    w_d = w0 * np.exp(-np.square(d1 + d2) / (2 * sig2)) * (1.0 - gt)
    return w_c + w_d


@pytest.mark.parametrize("seed,n_blobs", [(0, 1), (1, 3), (2, 6)])
def test_weighted_map_matches_reference(seed, n_blobs):
    gt = _blob_labels(2, 48, 48, n_blobs, seed=seed)
    got = np.asarray(weighted_map(jnp.asarray(gt), max_objects=16))
    for b in range(2):
        expected = _oracle_weighted_map(gt[b])
        np.testing.assert_allclose(got[b], expected, rtol=1e-4, atol=1e-4)


def test_weighted_map_parity_int_wc():
    gt = _blob_labels(1, 32, 32, 2, seed=3)
    got = np.asarray(weighted_map(jnp.asarray(gt), max_objects=8, parity_int_wc=True))
    expected = _oracle_weighted_map(gt[0], int_wc=True)
    np.testing.assert_allclose(got[0], expected, rtol=1e-4, atol=1e-4)


def test_weighted_map_banded_equals_exact():
    # The default edt_band=40 changes the map by < 3e-13 of w0 relative to
    # the exact full-height pass (border term is zero to f32 beyond d~30).
    gt = _blob_labels(2, 96, 96, 2, seed=5)
    banded = np.asarray(weighted_map(jnp.asarray(gt), max_objects=8))
    exact = np.asarray(weighted_map(jnp.asarray(gt), max_objects=8,
                                    edt_band=None))
    np.testing.assert_allclose(banded, exact, rtol=1e-6, atol=1e-6)


def test_weighted_map_empty_gt_no_nan():
    gt = np.zeros((1, 16, 16), np.int64)
    got = np.asarray(weighted_map(jnp.asarray(gt), max_objects=4))
    assert np.all(np.isfinite(got))
    np.testing.assert_array_equal(got, 1.0)  # w_c ones, w_d zero
