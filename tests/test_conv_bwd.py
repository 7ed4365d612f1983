"""The matmul-reformulated conv backward (ops/conv_bwd.py) computes the
exact same gradients autodiff does — per-op against jax.vjp on the native
conv, and end-to-end through the full model: conv_bwd='mm'/'auto' must
match conv_bwd='xla' grads at f32 tolerance. Hardware record: the e2e A/B
picked plain autodiff (results/r3/train_bwd_ab.txt — xla 65.9 ms/step vs
auto 73.4 / mm 86.4); these tests keep the research path exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.config import ModelConfig
from tpu_unet.models.unet import UNet
from tpu_unet.ops.conv_bwd import (auto_wgrad_impl, conv3x3_bias, conv3x3_valid,
                                   dgrad_mm, wgrad_mm)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("b,s,cin,cout", [(2, 12, 3, 8), (1, 9, 16, 4),
                                          (3, 7, 1, 5)])
def test_wgrad_mm_matches_autodiff(b, s, cin, cout):
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = _rand(kx, (b, s, s, cin))
    w = _rand(kw, (3, 3, cin, cout))
    g = _rand(kg, (b, s - 2, s - 2, cout))
    _, vjp = jax.vjp(lambda w_: conv3x3_valid(x, w_), w)
    np.testing.assert_allclose(wgrad_mm(g, x), vjp(g)[0],
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("b,s,cin,cout", [(2, 12, 3, 8), (1, 9, 16, 4),
                                          (3, 7, 1, 5)])
def test_dgrad_mm_matches_autodiff(b, s, cin, cout):
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = _rand(kx, (b, s, s, cin))
    w = _rand(kw, (3, 3, cin, cout))
    g = _rand(kg, (b, s - 2, s - 2, cout))
    _, vjp = jax.vjp(lambda x_: conv3x3_valid(x_, w), x)
    np.testing.assert_allclose(dgrad_mm(g, w), vjp(g)[0],
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("wgrad,dgrad", [("mm", "xla"), ("xla", "mm"),
                                         ("mm", "mm")])
def test_conv3x3_bias_vjp_matches_native(wgrad, dgrad):
    kx, kw, kb, kg = jax.random.split(jax.random.PRNGKey(2), 4)
    x = _rand(kx, (2, 10, 10, 6))
    w = _rand(kw, (3, 3, 6, 8))
    bias = _rand(kb, (8,))
    g = _rand(kg, (2, 8, 8, 8))

    def native(x_, w_, b_):
        return conv3x3_valid(x_, w_) + b_

    y0, vjp0 = jax.vjp(native, x, w, bias)
    y1, vjp1 = jax.vjp(
        lambda x_, w_, b_: conv3x3_bias(x_, w_, b_, wgrad=wgrad, dgrad=dgrad),
        x, w, bias)
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)
    for a, b in zip(vjp1(g), vjp0(g)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_conv3x3_bias_rejects_unknown_impl():
    x = jnp.zeros((1, 5, 5, 2))
    w = jnp.zeros((3, 3, 2, 2))
    b = jnp.zeros((2,))
    with pytest.raises(ValueError):
        conv3x3_bias(x, w, b, wgrad="pallas")


def test_auto_rule_covers_the_measured_pathological_band():
    # The 572-in enc1 layers (XLA wgrad 7.1 / 20.8 ms) must route to 'mm';
    # deep small layers and the wide enc0_conv2 stay on XLA.
    assert auto_wgrad_impl(572, 1) == "mm"     # enc0_conv1 (tiny cin)
    assert auto_wgrad_impl(284, 64) == "mm"    # enc1_conv1
    assert auto_wgrad_impl(282, 128) == "mm"   # enc1_conv2
    assert auto_wgrad_impl(570, 64) == "xla"   # enc0_conv2
    assert auto_wgrad_impl(30, 1024) == "xla"  # bottleneck
    assert auto_wgrad_impl(66, 512) == "xla"   # enc3_conv2


@pytest.mark.parametrize("conv_bwd", ["mm", "auto"])
def test_model_grads_match_xla_backward(conv_bwd):
    # Full-model check at the smallest valid depth-4 geometry (188 -> 4 out):
    # param grads with the custom backward must equal plain autodiff's.
    x = _rand(jax.random.PRNGKey(3), (2, 188, 188, 1))

    def loss_for(cfg):
        model = UNet(cfg)
        params = model.init(jax.random.PRNGKey(4), x)

        def loss(p, x_):
            return jnp.sum(model.apply(p, x_) ** 2)

        return params, loss

    p0, loss0 = loss_for(ModelConfig(conv_bwd="xla"))
    p1, loss1 = loss_for(ModelConfig(conv_bwd=conv_bwd))
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), p0, p1))

    g0 = jax.grad(loss0)(p0, x)
    g1 = jax.grad(loss1)(p1, x)
    leaves0, _ = jax.tree_util.tree_flatten(g0)
    leaves1, _ = jax.tree_util.tree_flatten(g1)
    for a, b in zip(leaves1, leaves0):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3)
