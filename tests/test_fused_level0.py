"""Fused level-0 chain kernels (ops/fused_level0.py) vs their XLA
compositions — interpret mode on CPU (same numerics path as the TPU
compile, minus Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.ops.fused_level0 import concat_quantize, enc0_chain


def _xla_enc0(x, w1, b1, w2, b2):
    def conv(v, w, b):
        dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "VALID",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)

    h1 = conv(x, w1, b1)
    h2 = conv(h1, w2, b2)
    pooled = jax.lax.reduce_window(h2, -jnp.inf, jax.lax.max,
                                   (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return h2, pooled


@pytest.mark.parametrize("pool_mode", ["fused", "cols", "none"])
def test_enc0_chain_matches_xla(pool_mode):
    key = jax.random.PRNGKey(0)
    c = 16
    x = jax.random.uniform(key, (2, 36, 44, 1), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 1, c)) * 0.5
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (c,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, c)) * 0.2
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (c,)) * 0.1

    skip, pooled = enc0_chain(x, w1, b1, w2, b2, block_rows=8,
                              pool_mode=pool_mode, interpret=True)
    skip_ref, pooled_ref = _xla_enc0(x, w1, b1, w2, b2)

    assert skip.shape == (2, 32, 40, c) and skip.dtype == jnp.bfloat16
    assert pooled.shape == (2, 16, 20, c)
    np.testing.assert_allclose(np.asarray(skip, np.float32),
                               np.asarray(skip_ref, np.float32),
                               rtol=0.03, atol=0.03)
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               np.asarray(pooled_ref, np.float32),
                               rtol=0.03, atol=0.03)


def test_enc0_chain_row_padding():
    # H-4 not divisible by block_rows: the padded rows must not leak.
    key = jax.random.PRNGKey(7)
    c = 8
    x = jax.random.uniform(key, (1, 26, 30, 1), jnp.float32)   # ho=22, wo=26
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 1, c)) * 0.5
    b1 = jnp.zeros((c,))
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, c)) * 0.2
    b2 = jnp.zeros((c,))
    skip, pooled = enc0_chain(x, w1, b1, w2, b2, block_rows=8, interpret=True)
    skip_ref, pooled_ref = _xla_enc0(x, w1, b1, w2, b2)
    assert skip.shape == skip_ref.shape and pooled.shape == pooled_ref.shape
    np.testing.assert_allclose(np.asarray(skip, np.float32),
                               np.asarray(skip_ref, np.float32),
                               rtol=0.03, atol=0.03)
    np.testing.assert_allclose(np.asarray(pooled, np.float32),
                               np.asarray(pooled_ref, np.float32),
                               rtol=0.03, atol=0.03)


def test_concat_quantize_exact():
    key = jax.random.PRNGKey(3)
    a = (jax.random.uniform(key, (2, 37, 40, 16)) * 4).astype(jnp.bfloat16)
    b = (jax.random.uniform(jax.random.fold_in(key, 1), (2, 37, 40, 16))
         * 4).astype(jnp.bfloat16)
    s = 0.03
    got = concat_quantize(a, b, s, block_rows=16, interpret=True)
    cat = jnp.concatenate([a, b], axis=-1)
    want = jnp.clip(jnp.round(cat.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)
    assert got.shape == cat.shape and got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_enc0_chain_int8_skip():
    key = jax.random.PRNGKey(11)
    c = 8
    x = jax.random.uniform(key, (1, 28, 28, 1), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 1, c)) * 0.5
    b1 = jnp.zeros((c,))
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, c, c)) * 0.2
    b2 = jnp.zeros((c,))
    s = 0.05
    skip_q, pooled = enc0_chain(x, w1, b1, w2, b2, block_rows=8,
                                skip_scale=s, interpret=True)
    skip_b, _ = enc0_chain(x, w1, b1, w2, b2, block_rows=8, interpret=True)
    assert skip_q.dtype == jnp.int8
    want = jnp.clip(jnp.round(skip_b.astype(jnp.float32) / s), 0, 127)
    got = np.asarray(skip_q, np.float32)
    # bf16 rounding of the reference path can flip a borderline round();
    # allow off-by-one on a tiny fraction of pixels
    diff = np.abs(got - np.asarray(want))
    assert (diff <= 1).all() and (diff > 0).mean() < 0.05


def test_concat_quantize_mixed_int8_input():
    key = jax.random.PRNGKey(5)
    s = 0.04
    a_b = (jax.random.uniform(key, (1, 20, 24, 16)) * 3).astype(jnp.bfloat16)
    a_q = jnp.clip(jnp.round(a_b.astype(jnp.float32) / s), -127, 127
                   ).astype(jnp.int8)
    b = (jax.random.uniform(jax.random.fold_in(key, 1), (1, 20, 24, 16))
         * 3).astype(jnp.bfloat16)
    got = concat_quantize(a_q, b, s, block_rows=8, interpret=True)
    want_b = jnp.clip(jnp.round(b.astype(jnp.float32) / s), -127, 127
                      ).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got[..., :16]), np.asarray(a_q))
    np.testing.assert_array_equal(np.asarray(got[..., 16:]), np.asarray(want_b))


def test_kernels_lower_for_tpu():
    """Mosaic-lowering regression gate: both kernels must LOWER for the TPU
    target (catches 'Only 2D gather is supported'-class rejections without
    hardware — the lowering runs entirely on the host)."""
    x = jnp.zeros((1, 36, 44, 1), jnp.float32)
    w1 = jnp.zeros((3, 3, 1, 64))
    b1 = jnp.zeros((64,))
    w2 = jnp.zeros((3, 3, 64, 64))
    b2 = jnp.zeros((64,))
    for ss in (0.0, 0.02):
        jax.jit(lambda x, _ss=ss: enc0_chain(x, w1, b1, w2, b2, block_rows=8,
                                             skip_scale=_ss)
                ).trace(x).lower(lowering_platforms=("tpu",))
    a = jnp.zeros((1, 40, 48, 64), jnp.bfloat16)
    q = jnp.zeros((1, 40, 48, 64), jnp.int8)
    jax.jit(lambda a, b: concat_quantize(a, b, 0.02, block_rows=8)
            ).trace(a, a).lower(lowering_platforms=("tpu",))
    jax.jit(lambda a, b: concat_quantize(a, b, 0.02, block_rows=8)
            ).trace(q, a).lower(lowering_platforms=("tpu",))
