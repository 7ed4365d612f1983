"""Pallas batch<->channel pairing copies (ops/interleave.py) vs the jnp
reference formulation they replace."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.ops.interleave import (
    interleave_pairs,
    pair_batch_channels,
    unpair_batch_channels,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.int8])
def test_pair_unpair_roundtrip(dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-100, 100, (6, 12, 20, 8))).astype(dtype)
    p = pair_batch_channels(x, interpret=True)
    ref = jnp.concatenate([x[:3], x[3:]], axis=-1)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref))
    u = unpair_batch_channels(p, interpret=True)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(x))


def test_interleave_pairs_matches_per_image_concat():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(2, 8, 10, 6).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 8, 10, 6).astype(np.float32))
    got = interleave_pairs(a, b, interpret=True)
    c = 3
    ref = jnp.concatenate([a[..., :c], b[..., :c],
                           a[..., c:], b[..., c:]], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pair_odd_rows_blocking():
    # h with few divisors exercises the row-block search
    x = jnp.arange(2 * 7 * 6 * 4, dtype=jnp.float32).reshape(2, 7, 6, 4)
    p = pair_batch_channels(x, interpret=True)
    ref = jnp.concatenate([x[:1], x[1:]], axis=-1)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref))
