"""Exactness of the phase-packing (space-to-depth) serving formulation.

Every packed-domain op must reproduce its full-resolution counterpart
bit-for-bit (the packing is a data relabeling; the packed kernels embed the
original taps with zeros). Float comparisons use exact equality where the
reduction order is identical and tight tolerances where XLA may reassociate
(the 2x2 conv contracts over a differently-ordered axis than the 3x3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_unet.ops.phase import (
    conv2x2_valid,
    depth_to_space,
    phase_crop,
    phase_head_kernel,
    phase_pack_kernel,
    phase_pool,
    phase_upconv_weights,
    space_to_depth,
)


def conv3x3(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                    dimension_numbers=dn)


def rnd(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def test_s2d_roundtrip_and_layout():
    x = rnd(0, (2, 8, 10, 3))
    p = space_to_depth(x)
    assert p.shape == (2, 4, 5, 12)
    # phase-major: channel (p*2+q)*C + c holds pixel (2i+p, 2j+q, c)
    assert jnp.array_equal(p[:, 1, 2, 1 * 3 + 2], x[:, 2, 5, 2])
    assert jnp.array_equal(p[:, 1, 2, (1 * 2 + 1) * 3 + 0], x[:, 3, 5, 0])
    assert jnp.array_equal(depth_to_space(p), x)


@pytest.mark.parametrize("ci,co,h,w", [(1, 8, 10, 12), (8, 8, 14, 10),
                                       (16, 8, 12, 12)])
def test_phase_conv_matches_conv3x3(ci, co, h, w):
    x = rnd(1, (2, h, w, ci))
    k = rnd(2, (3, 3, ci, co)) * 0.3
    ref = space_to_depth(conv3x3(x, k))          # output h-2 even
    got = conv2x2_valid(space_to_depth(x), jnp.asarray(phase_pack_kernel(k)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_conv_int8_exact():
    # int8 x int8 -> int32: reduction over zeros is exact, so the packed
    # form must match the 3x3 conv bit-for-bit.
    kx = jax.random.randint(jax.random.PRNGKey(3), (2, 12, 12, 8), -7, 8)
    kw = jax.random.randint(jax.random.PRNGKey(4), (3, 3, 8, 16), -7, 8)
    x = kx.astype(jnp.int8)
    w = kw.astype(jnp.int8)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = space_to_depth(lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32))
    wp = jnp.asarray(phase_pack_kernel(np.asarray(kw.astype(jnp.int32))
                                       ).astype(np.int8))
    got = conv2x2_valid(space_to_depth(x), wp, preferred=jnp.int32)
    assert jnp.array_equal(got, ref)


def test_phase_pool_matches_maxpool():
    x = rnd(5, (2, 12, 16, 8))
    ref = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                            "VALID")
    got = phase_pool(space_to_depth(x))
    assert jnp.array_equal(got, ref)


def test_phase_pool_consumes_packing():
    # pool output is the UNPACKED next-level tensor: chaining
    # s2d -> packed conv -> phase_pool equals conv3x3 -> pool at full res.
    x = rnd(6, (1, 18, 18, 4))
    k = rnd(7, (3, 3, 4, 8)) * 0.3
    y = conv3x3(x, k)
    ref = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                            "VALID")
    got = phase_pool(conv2x2_valid(space_to_depth(x),
                                   jnp.asarray(phase_pack_kernel(k))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_upconv_matches_conv_transpose():
    x = rnd(8, (2, 7, 9, 16))
    k = rnd(9, (2, 2, 16, 8)) * 0.3
    b = rnd(10, (8,)) * 0.1
    ref = lax.conv_transpose(x, k, (2, 2), "VALID",
                             dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    m, bp = phase_upconv_weights(k, b)
    got = depth_to_space((x @ jnp.asarray(m) + jnp.asarray(bp)
                          ).reshape(x.shape[0], x.shape[1], x.shape[2], -1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_head_matches_1x1():
    x = rnd(11, (2, 10, 10, 8))
    k = rnd(12, (1, 1, 8, 2)) * 0.3
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = space_to_depth(lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=dn))
    got = conv2x2_valid(space_to_depth(x), jnp.asarray(phase_head_kernel(k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_crop_matches_center_crop():
    x = rnd(13, (1, 20, 20, 4))
    ref = space_to_depth(x[:, 4:-4, 4:-4, :])
    got = phase_crop(space_to_depth(x), 4)
    assert jnp.array_equal(got, ref)
    with pytest.raises(ValueError):
        phase_crop(space_to_depth(x), 3)


def test_split_concat_conv_equality():
    # conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])
    a = rnd(14, (2, 10, 10, 8))
    b = rnd(15, (2, 10, 10, 8))
    w = rnd(16, (3, 3, 16, 4)) * 0.3
    ref = conv3x3(jnp.concatenate([a, b], axis=-1), w)
    got = conv3x3(a, w[:, :, :8]) + conv3x3(b, w[:, :, 8:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_phase_enc0_chain_end_to_end():
    # s2d(input) -> packed conv+relu -> packed conv+relu -> phase_pool
    # equals the full-resolution enc0 chain, including odd intermediate
    # packed sizes (20 -> 10 -> 9 -> 8 packed; 20 -> 18 -> 16 -> pool 8).
    x = rnd(17, (1, 20, 20, 1))
    k1 = rnd(18, (3, 3, 1, 8)) * 0.5
    k2 = rnd(19, (3, 3, 8, 8)) * 0.3
    y = jnp.maximum(conv3x3(x, k1), 0.0)
    y = jnp.maximum(conv3x3(y, k2), 0.0)
    ref = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                            "VALID")
    p = space_to_depth(x)
    p = jnp.maximum(conv2x2_valid(p, jnp.asarray(phase_pack_kernel(k1))), 0.0)
    p = jnp.maximum(conv2x2_valid(p, jnp.asarray(phase_pack_kernel(k2))), 0.0)
    got = phase_pool(p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
