"""Pallas EDT column-pass kernel vs the scan oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.ops.edt import edt_batch, edt


def _blobs(h, w, n, seed=0):
    rng = np.random.RandomState(seed)
    m = np.zeros((h, w), bool)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx, r = rng.randint(5, h - 5), rng.randint(5, w - 5), rng.randint(2, 6)
        m[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = True
    return m


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_column_pass_matches_scan(seed):
    masks = np.stack([_blobs(40, 48, 3, seed), _blobs(40, 48, 1, seed + 10),
                      np.zeros((40, 48), bool)])
    scan = np.asarray(edt_batch(jnp.asarray(masks), use_pallas=False))
    pallas = np.asarray(edt_batch(jnp.asarray(masks), use_pallas=True,
                                  interpret=True))
    # Empty plane: both inf.
    assert np.isinf(pallas[2]).all() and np.isinf(scan[2]).all()
    np.testing.assert_allclose(pallas[:2], scan[:2], rtol=1e-5, atol=1e-5)


def test_pallas_column_pass_under_vmap():
    # weighted_map vmaps over the batch; the pallas call must vmap cleanly.
    masks = np.stack([
        np.stack([_blobs(24, 32, 2, s), _blobs(24, 32, 1, s + 5)])
        for s in range(3)
    ])  # [3, 2, H, W]
    fn = jax.vmap(lambda m: edt_batch(m, use_pallas=True, interpret=True))
    got = np.asarray(fn(jnp.asarray(masks)))
    exp = np.asarray(jax.vmap(lambda m: edt_batch(m, use_pallas=False))(
        jnp.asarray(masks)))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)


def test_num_valid_skips_padding_planes():
    masks = np.stack([_blobs(32, 32, 2, 0), _blobs(32, 32, 1, 1),
                      np.zeros((32, 32), bool), np.zeros((32, 32), bool)])
    full = np.asarray(edt_batch(jnp.asarray(masks), use_pallas=False))
    skip = np.asarray(edt_batch(jnp.asarray(masks), use_pallas=True,
                                interpret=True, num_valid=jnp.int32(2)))
    np.testing.assert_allclose(skip[:2], full[:2], rtol=1e-5)
    assert np.isinf(skip[2:]).all()


def test_num_valid_under_vmap():
    # weighted_map path: vmap over batch with per-sample num counts.
    masks = np.stack([
        np.stack([_blobs(24, 24, 1, s), np.zeros((24, 24), bool)])
        for s in range(3)
    ])
    nums = jnp.asarray([1, 1, 1], jnp.int32)
    fn = jax.vmap(lambda m, n: edt_batch(m, use_pallas=True, interpret=True,
                                         num_valid=n))
    got = np.asarray(fn(jnp.asarray(masks), nums))
    exp = np.asarray(jax.vmap(lambda m: edt_batch(m, use_pallas=False))(
        jnp.asarray(masks)))
    np.testing.assert_allclose(got[:, 0], exp[:, 0], rtol=1e-5)
    assert np.isinf(got[:, 1]).all()


@pytest.mark.parametrize("band", [4, 12])
def test_banded_column_pass(band):
    # Banded pallas kernel == banded scan (both paths); both == exact
    # wherever the exact distance is within the band.
    masks = np.stack([_blobs(40, 48, 3, 0), _blobs(40, 48, 1, 7),
                      np.zeros((40, 48), bool)])
    m = jnp.asarray(masks)
    exact = np.asarray(edt_batch(m, use_pallas=False))
    b_scan = np.asarray(edt_batch(m, use_pallas=False, band=band))
    b_pallas = np.asarray(edt_batch(m, use_pallas=True, interpret=True,
                                    band=band))
    np.testing.assert_allclose(b_pallas, b_scan, rtol=1e-5, atol=1e-5)
    inside = exact <= band
    np.testing.assert_allclose(b_scan[inside], exact[inside], rtol=1e-5,
                               atol=1e-5)
    # outside the band the result can only grow (min over a subset)
    assert np.all(b_scan[~inside] >= exact[~inside] - 1e-4)
    assert np.isinf(b_pallas[2]).all()


def test_single_edt_unchanged():
    m = _blobs(32, 32, 2, 3)
    a = np.asarray(edt(jnp.asarray(m)))
    b = np.asarray(edt_batch(jnp.asarray(m[None]), use_pallas=False))[0]
    np.testing.assert_allclose(a, b)
