"""Fused single-gather warp vs the two-stage chain, and the matmul Gaussian
vs the conv/scipy oracle."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from tpu_unet.config import AugmentConfig
from tpu_unet.data import AugmentPipeline, synthetic_dataset
from tpu_unet.data.augment import _fused_rotate_elastic
from tpu_unet.ops.warp import (
    elastic_warp,
    gaussian_filter,
    rotate_about_center,
)


@pytest.mark.parametrize("sigma", [1.5, 10.0])
def test_gaussian_matmul_matches_scipy(sigma):
    img = np.random.RandomState(0).rand(96, 80).astype(np.float32)
    expected = ndi.gaussian_filter(img, sigma, mode="constant", cval=0.0)
    got = np.asarray(gaussian_filter(jnp.asarray(img), sigma, method="matmul"))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    conv = np.asarray(gaussian_filter(jnp.asarray(img), sigma, method="conv"))
    np.testing.assert_allclose(got, conv, rtol=1e-4, atol=1e-6)


def test_fused_warp_zero_alpha_equals_rotation():
    img = np.random.RandomState(1).rand(64, 64).astype(np.float32)
    zeros = jnp.zeros((96, 96))
    for deg in [0.0, 30.0, 90.0, 210.0]:
        fused = np.asarray(_fused_rotate_elastic(
            jnp.asarray(img), jnp.float32(deg), zeros, zeros, 96))
        rot = np.asarray(rotate_about_center(jnp.asarray(img), jnp.float32(deg), 96))
        np.testing.assert_allclose(fused, rot, atol=1e-5)


def test_fused_warp_close_to_two_stage():
    # Composite-coordinate bilinear vs bilinear-of-bilinear: identical warp
    # geometry, differing only in interpolation smoothing -> small residual.
    rng = np.random.RandomState(2)
    img = ndi.gaussian_filter(rng.rand(80, 80), 2.0).astype(np.float32)  # smooth
    s = 120
    dx = jnp.asarray(ndi.gaussian_filter(rng.randn(s, s), 8.0) * 30, jnp.float32)
    dy = jnp.asarray(ndi.gaussian_filter(rng.randn(s, s), 8.0) * 30, jnp.float32)
    fused = np.asarray(_fused_rotate_elastic(jnp.asarray(img), jnp.float32(30.0),
                                             dx, dy, s))
    rot = rotate_about_center(jnp.asarray(img), jnp.float32(30.0), s)
    two = np.asarray(elastic_warp(rot, dx, dy))
    mask = (two != 0) & (fused != 0)
    diff = np.abs(fused - two)[mask]
    assert diff.mean() < 0.01
    assert np.corrcoef(fused[mask], two[mask])[0, 1] > 0.995


def test_stacked_gather_matches_take4():
    # The production stacked-neighborhood single-gather path must be
    # bit-identical to the four-take formulation (same taps, same weights,
    # same summation order — only the gather mechanism differs).
    from tpu_unet.data.augment import _fused_rotate_elastic_multi
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.rand(72, 72, 2).astype(np.float32))
    s = 96
    dx = jnp.asarray(ndi.gaussian_filter(rng.randn(s, s), 8.0) * 25,
                     jnp.float32)
    dy = jnp.asarray(ndi.gaussian_filter(rng.randn(s, s), 8.0) * 25,
                     jnp.float32)
    for deg in (0.0, 30.0, 210.0):
        a = _fused_rotate_elastic_multi(src, jnp.float32(deg), dx, dy, s,
                                        gather="stacked")
        b = _fused_rotate_elastic_multi(src, jnp.float32(deg), dx, dy, s,
                                        gather="take4")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("fused", [True, False])
def test_pipeline_both_paths(fused):
    data = synthetic_dataset(n_images=2, h=160, w=160, crop=64, seed=4)
    pipe = AugmentPipeline(AugmentConfig(crop=64, fused_warp=fused))
    inp, gt = pipe(
        jnp.asarray(data.images), jnp.asarray(data.targets),
        jnp.asarray(data.crop_log_probs), jnp.asarray(data.crop_pairs),
        np.array([0, 1]), jax.random.PRNGKey(0),
    )
    assert inp.shape == (2, 380, 380, 1)
    assert set(np.unique(np.asarray(gt))) <= {0, 1}
    assert np.isfinite(np.asarray(inp)).all()
