"""Golden tests for the v2 fused conv tiles (ops/conv_tiles.py): Pallas
interpret mode vs the XLA implementation of identical quantized semantics,
and the quantization helpers' round-trip error bound."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.ops.conv_tiles import (
    conv3x3_fused,
    conv3x3_int8_xla,
    quantize_activations,
    quantize_weights,
)


@pytest.mark.parametrize("variant", ["nconcat", "taps", "rows3", "im2col"])
@pytest.mark.parametrize("h,w,cin,cout,br,ct", [
    (18, 20, 8, 16, 8, 16),    # rows divide evenly
    (21, 19, 8, 16, 8, 8),     # row padding + cout tiling
    (12, 12, 16, 8, 4, 8),
])
def test_int8_kernel_matches_xla_oracle(h, w, cin, cout, br, ct, variant):
    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (2, h, w, cin)).astype(np.int8)
    wq = rng.randint(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    alpha = rng.rand(cout).astype(np.float32) * 1e-3
    beta = rng.randn(cout).astype(np.float32) * 0.1

    got8 = conv3x3_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(alpha),
                         jnp.asarray(beta), out_kind="int8", block_rows=br,
                         cout_tile=ct, interpret=True, variant=variant)
    exp8 = conv3x3_int8_xla(jnp.asarray(x), jnp.asarray(wq),
                            jnp.asarray(alpha), jnp.asarray(beta),
                            out_kind="int8")
    assert got8.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(exp8))

    got16 = conv3x3_fused(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(alpha),
                          jnp.asarray(beta), out_kind="bf16", block_rows=br,
                          cout_tile=ct, interpret=True, variant=variant)
    exp16 = conv3x3_int8_xla(jnp.asarray(x), jnp.asarray(wq),
                             jnp.asarray(alpha), jnp.asarray(beta),
                             out_kind="bf16")
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got16, np.float32),
                               np.asarray(exp16, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_bf16_kernel_matches_f32_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 20, 22, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1
    b = rng.randn(16).astype(np.float32) * 0.1
    got = conv3x3_fused(jnp.asarray(x, jnp.bfloat16),
                        jnp.asarray(w, jnp.bfloat16),
                        jnp.ones(16), jnp.asarray(b),
                        block_rows=6, interpret=True)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    exp = np.maximum(np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=dn)) + b, 0.0)
    np.testing.assert_allclose(np.asarray(got, np.float32), exp,
                               rtol=5e-2, atol=5e-2)


def test_quantized_conv_approximates_f32():
    # End-to-end quantization error on realistic magnitudes: quantize
    # activations+weights, run the fused int8 conv with bf16 output, compare
    # against the f32 conv — error bounded by the quantization step.
    rng = np.random.RandomState(2)
    x = np.abs(rng.randn(1, 16, 16, 8)).astype(np.float32)
    w = (rng.randn(3, 3, 8, 8) * 0.2).astype(np.float32)
    b = (rng.randn(8) * 0.05).astype(np.float32)

    s_x = float(np.abs(x).max() / 127.0)
    xq = quantize_activations(jnp.asarray(x), s_x)
    wq, s_w = quantize_weights(jnp.asarray(w))
    alpha = s_x * s_w
    got = np.asarray(conv3x3_fused(xq, wq, alpha, jnp.asarray(b),
                                   out_kind="bf16", block_rows=7,
                                   interpret=True), np.float32)

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    exp = np.maximum(np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=dn)) + b, 0.0)
    err = np.abs(got - exp).max() / max(exp.max(), 1e-6)
    assert err < 0.05, f"relative int8 error {err:.4f}"


def test_quantize_weights_roundtrip():
    rng = np.random.RandomState(3)
    w = rng.randn(3, 3, 4, 4).astype(np.float32)
    wq, s = quantize_weights(jnp.asarray(w))
    back = np.asarray(wq, np.float32) * np.asarray(s)
    assert np.abs(back - w).max() <= np.asarray(s).max() * 0.5 + 1e-7


# --- int4 primitives (results/r3/int4_probe2.txt: ~2x int8 MXU rate) --------

def _conv_i32_oracle(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.int32), jnp.asarray(w, jnp.int32), (1, 1),
        "VALID", dimension_numbers=dn, preferred_element_type=jnp.int32)


def test_int4_conv_signed_matches_integer_oracle():
    from tpu_unet.ops.conv_tiles import conv3x3_int4_xla

    rng = np.random.RandomState(0)
    x = rng.randint(-7, 8, (2, 12, 12, 16)).astype(np.int8)
    w = rng.randint(-7, 8, (3, 3, 16, 8)).astype(np.int8)
    alpha = jnp.ones((8,), jnp.float32)
    beta = jnp.zeros((8,), jnp.float32)
    got = conv3x3_int4_xla(jnp.asarray(x), jnp.asarray(w), alpha, beta)
    exp = jnp.maximum(_conv_i32_oracle(x, w).astype(jnp.float32),
                      0.0).astype(jnp.bfloat16)
    assert bool(jnp.all(got == exp))


def test_int4_conv_shifted_u4_matches_unsigned_oracle():
    """The shifted encoding recovers 16 unsigned levels on the signed MXU:
    conv(u) == conv(u - 8) + 8 * sum(w) for VALID convs, exactly."""
    from tpu_unet.ops.conv_tiles import conv3x3_int4_xla

    rng = np.random.RandomState(1)
    u = rng.randint(0, 16, (2, 11, 13, 8)).astype(np.int32)
    w = rng.randint(-7, 8, (3, 3, 8, 8)).astype(np.int8)
    alpha = jnp.ones((8,), jnp.float32)
    beta = jnp.zeros((8,), jnp.float32)
    got = conv3x3_int4_xla(jnp.asarray((u - 8).astype(np.int8)),
                           jnp.asarray(w), alpha, beta, shifted=True)
    exp = jnp.maximum(_conv_i32_oracle(u, w).astype(jnp.float32),
                      0.0).astype(jnp.bfloat16)
    assert bool(jnp.all(got == exp))


def test_int4_u4s_requantize_epilogue():
    from tpu_unet.ops.conv_tiles import conv3x3_int4_xla

    rng = np.random.RandomState(2)
    x = rng.randint(-7, 8, (1, 8, 8, 8)).astype(np.int8)
    w = rng.randint(-7, 8, (3, 3, 8, 8)).astype(np.int8)
    alpha = jnp.full((8,), 0.07, jnp.float32)
    beta = jnp.full((8,), 0.3, jnp.float32)
    got = conv3x3_int4_xla(jnp.asarray(x), jnp.asarray(w), alpha, beta,
                           out_kind="u4s")
    y = np.maximum(np.asarray(_conv_i32_oracle(x, w), np.float32)
                   * 0.07 + 0.3, 0.0)
    exp = (np.clip(np.round(y), 0.0, 15.0) - 8.0).astype(np.int8)
    assert got.dtype == jnp.int8
    assert np.array_equal(np.asarray(got), exp)


def test_int4_activation_quantizers():
    from tpu_unet.ops.conv_tiles import (quantize_activations_s4,
                                         quantize_activations_u4s,
                                         requantize_i8_to_u4s)

    x = jnp.asarray([0.0, 0.49, 0.51, 7.5, 100.0])
    u = quantize_activations_u4s(x, 0.5)      # levels of 0.5, max 15
    assert np.array_equal(np.asarray(u), [-8, -7, -7, 7, 7])
    s = quantize_activations_s4(jnp.asarray([-100.0, -3.2, 3.2, 100.0]), 1.0)
    assert np.array_equal(np.asarray(s), [-7, -3, 3, 7])
    # int8 at scale 1/127 -> u4s at scale 127/(15*127): exact requantize
    v8 = jnp.asarray([0, 64, 127], jnp.int8)
    u4 = requantize_i8_to_u4s(v8, 1.0, 127.0 / 15.0)
    assert np.array_equal(np.asarray(u4), [-8, 8 - 8, 15 - 8])


def test_quantize_weights_int4_roundtrip():
    from tpu_unet.ops.conv_tiles import quantize_weights_int4

    rng = np.random.RandomState(3)
    w = rng.randn(3, 3, 4, 4).astype(np.float32)
    wq, s = quantize_weights_int4(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and int(jnp.max(jnp.abs(wq))) <= 7
    back = np.asarray(wq, np.float32) * np.asarray(s)
    assert np.abs(back - w).max() <= np.asarray(s).max() * 0.5 + 1e-7
