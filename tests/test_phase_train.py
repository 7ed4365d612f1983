"""Phase-packed level-0 TRAINING path (``ModelConfig.phase_level0``).

The serving engine has its own int8 phase path (infer/quant.py); this flag
runs the *trainable* model with level 0 in the phase domain — same canonical
parameter tree (kernels packed inside the forward, differentiably), so the
flag must be a pure execution choice: forward and gradients bit-for-bit
shape-identical and numerically equal (fp reassociation tolerance) to the
plain model. Reference workload: /root/reference/network.py:129-141 (level-0
convs/pool), :38-58 (upconv), trained by trainer.py:52-89.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.config import ModelConfig
from tpu_unet.models.unet import UNet
from tpu_unet.ops.phase import phase_pack_kernel, phase_pack_kernel_jnp

IN = 204   # 16*9 + 60: valid depth-4 input, 20x20 output


def _tree_allclose(a, b, rtol, atol):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa, np.float64),
                                   np.asarray(xb, np.float64),
                                   rtol=rtol, atol=atol)


def test_pack_kernel_jnp_matches_numpy():
    w = np.random.default_rng(0).normal(size=(3, 3, 5, 7)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(phase_pack_kernel_jnp(w)),
                                  phase_pack_kernel(w))


@pytest.mark.parametrize("variant", ["paper", "parity"])
def test_phase_forward_matches_plain(variant):
    cfg = ModelConfig(skip_variant=variant)
    model = UNet(cfg)
    model_p = UNet(dataclasses.replace(cfg, phase_level0=True))
    # parity's post-pool zero-padded skips need an even l in the 16l+60
    # size arithmetic (the reference trains at 572 = 16*32+60); paper
    # handles any valid size — exercise an odd l there.
    size = IN if variant == "paper" else 188
    x = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, 1),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    params_p = model_p.init(jax.random.PRNGKey(0), x)
    # Identical canonical parameter trees: same keys, same shapes.
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_p))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_p)):
        assert a.shape == b.shape
    del params_p
    y = model.apply(params, x)
    y_p = model_p.apply(params, x)
    assert y.shape == y_p.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y),
                               rtol=2e-4, atol=2e-4)


def test_phase_grads_match_plain():
    cfg = ModelConfig()
    model = UNet(cfg)
    model_p = UNet(dataclasses.replace(cfg, phase_level0=True))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, IN, IN, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    tgt = (jax.random.uniform(jax.random.PRNGKey(3), (1, 20, 20, 1))
           > 0.5).astype(jnp.float32)

    def loss(m):
        def f(p):
            logits = m.apply(p, x)
            # weighted-BCE-shaped scalar: exercises both logit channels
            lo = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(tgt[..., 0] * lo[..., 1]
                             + (1 - tgt[..., 0]) * lo[..., 0])
        return f

    g = jax.grad(loss(model))(params)
    g_p = jax.grad(loss(model_p))(params)
    _tree_allclose(g_p, g, rtol=5e-4, atol=1e-6)


def test_phase_rejects_non_xla_conv_impl():
    cfg = ModelConfig(phase_level0=True, conv_impl="pallas")
    with pytest.raises(ValueError, match="phase_level0"):
        UNet(cfg).init(jax.random.PRNGKey(0),
                       jnp.zeros((1, IN, IN, 1), jnp.float32))


def test_phase_bf16_trains_a_step():
    """The production train config (bf16 compute) takes an SGD step under
    jit with finite loss — the hardware A/B entry point compiles."""
    cfg = ModelConfig(compute_dtype="bfloat16", phase_level0=True, remat=True)
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, IN, IN, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    tgt = (jax.random.uniform(jax.random.PRNGKey(5), (1, 20, 20, 1))
           > 0.5).astype(jnp.float32)

    @jax.jit
    def step(p):
        def loss(p):
            logits = model.apply(p, x)
            lo = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(tgt[..., 0] * lo[..., 1]
                             + (1 - tgt[..., 0]) * lo[..., 0])
        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree_util.tree_map(lambda a, b: a - 0.01 * b, p, g)

    l, p2 = step(params)
    assert np.isfinite(float(l))
    # params moved
    d = sum(float(jnp.sum(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(p2)))
    assert d > 0
