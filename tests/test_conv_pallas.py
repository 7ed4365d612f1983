"""Pallas fused conv kernel vs XLA conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.ops.conv_pallas import conv3x3_bias_relu, conv3x3_bias_relu_xla


@pytest.mark.parametrize("impl", ["slab", "dma"])
@pytest.mark.parametrize("shape,cout", [
    ((1, 18, 20, 8), 16),     # ho=16 multiple of block_rows
    ((2, 13, 16, 4), 8),      # ragged rows -> padding path
    ((1, 10, 34, 16), 32),
])
def test_pallas_conv_matches_xla(shape, cout, impl):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, shape[-1], cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    expected = conv3x3_bias_relu_xla(x, w, b)
    got = conv3x3_bias_relu(x, w, b, block_rows=8, interpret=True, impl=impl)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_pallas_conv_cout_tiling():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 12, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 32) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    expected = conv3x3_bias_relu_xla(x, w, b)
    got = conv3x3_bias_relu(x, w, b, block_rows=8, cout_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_pallas_conv_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 18, 20, 8), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(16) * 0.1, jnp.bfloat16)
    expected = conv3x3_bias_relu_xla(x, w, b)
    got = conv3x3_bias_relu(x, w, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32),
        rtol=2e-2, atol=2e-2)
