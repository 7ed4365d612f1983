"""U-Net geometry, skip variants, init schemes (reference network.py:8-192)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig
from tpu_unet.models import UNet, center_crop_or_pad


def _tiny_cfg(**kw):
    # base_width=4 keeps CPU tests fast; geometry is width-independent.
    return ModelConfig(base_width=4, **kw)


@pytest.mark.parametrize("variant", ["paper", "parity"])
def test_forward_shape_188(variant):
    # Smallest valid size: l=8 -> input 188, output 4.
    cfg = _tiny_cfg(skip_variant=variant)
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 4, 4, 2)
    assert y.dtype == jnp.float32


@pytest.mark.parametrize("variant", ["paper", "parity"])
def test_forward_shape_380(variant):
    cfg = _tiny_cfg(skip_variant=variant)
    model = UNet(cfg)
    x = jnp.zeros((2, 380, 380, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = jax.eval_shape(lambda p, x: model.apply(p, x), params, x)
    assert y.shape == (2, 196, 196, 2)


def test_param_count_full_width():
    # The paper U-Net has ~31M parameters; check ours matches the reference
    # topology's exact count (23 learned conv layers, network.py:23-58).
    cfg = ModelConfig()
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))

    def count(p):
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(p))

    total = count(params)

    def torch_count():
        # Re-derive from the reference layer list (network.py:23-58).
        convs = [
            (1, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 512), (512, 512), (512, 1024), (1024, 1024),  # encoder+bottleneck
            (1024, 512), (512, 512), (512, 256), (256, 256),
            (256, 128), (128, 128), (128, 64), (64, 64),        # decoder 3x3
        ]
        ups = [(1024, 512), (512, 256), (256, 128), (128, 64)]
        n = sum(i * o * 9 + o for i, o in convs)
        n += sum(i * o * 4 + o for i, o in ups)
        n += 64 * 2 * 1 + 2  # 1x1 head
        return n

    assert total == torch_count()


def test_width_multiplier():
    cfg = _tiny_cfg(width_mult=2)
    assert cfg.widths == (8, 16, 32, 64, 128)
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    k = params["params"]["enc0_conv1"]["kernel"]
    assert k.shape == (3, 3, 1, 8)


def test_bf16_compute_f32_logits():
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    model = UNet(cfg)
    x = jnp.ones((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.dtype == jnp.float32
    # Params stay f32.
    assert params["params"]["enc0_conv1"]["kernel"].dtype == jnp.float32


def test_paper_init_statistics():
    cfg = ModelConfig(base_width=64, init_scheme="paper")
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(42), x)["params"]
    # enc1_conv2: fan_in = 128, k=3 -> std = sqrt(2/(9*128))
    k = np.asarray(params["enc1_conv2"]["kernel"])
    assert abs(k.std() - math.sqrt(2 / (9 * 128))) / math.sqrt(2 / (9 * 128)) < 0.05
    # biases zero
    assert np.all(np.asarray(params["enc1_conv2"]["bias"]) == 0)


def test_parity_init_statistics():
    cfg = ModelConfig(base_width=64, init_scheme="parity")
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(42), x)["params"]
    # First conv: std = sqrt(2) (network.py:70).
    k0 = np.asarray(params["enc0_conv1"]["kernel"])
    # only 9*64 samples -> loose tolerance
    assert abs(k0.std() - math.sqrt(2)) / math.sqrt(2) < 0.15
    # enc0_conv2 (network.py:71): std = 2/sqrt(64*9) = 1/12.
    k1 = np.asarray(params["enc0_conv2"]["kernel"])
    assert abs(k1.std() - 2 / math.sqrt(64 * 9)) / (2 / math.sqrt(64 * 9)) < 0.05
    # dec3_conv1 (network.py:87): std = 2/sqrt(512*9 + 512*4).
    kd = np.asarray(params["dec3_conv1"]["kernel"])
    expected = 2 / math.sqrt(512 * 13)
    assert abs(kd.std() - expected) / expected < 0.05
    # biases torch-default uniform, bound 1/sqrt(fan_in*k^2)
    b = np.asarray(params["enc0_conv2"]["bias"])
    bound = 1 / math.sqrt(64 * 9)
    assert np.all(np.abs(b) <= bound) and b.std() > 0


def test_depth_3_variant():
    # Depth generality: 3 pooling steps, context 12*8-8 = 88, input 8l+28.
    from tpu_unet.core.geometry import context_for_depth, output_size_for_input

    assert context_for_depth(3) == 88
    cfg = ModelConfig(base_width=2, depth=3)
    model = UNet(cfg)
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 100, 100, 2)
    assert output_size_for_input(188, 3) == 100


def test_center_crop_or_pad():
    a = jnp.arange(36, dtype=jnp.float32).reshape(1, 6, 6, 1)
    # crop 6 -> 2 center
    c = center_crop_or_pad(a, (2, 2))
    np.testing.assert_array_equal(np.asarray(c)[0, :, :, 0],
                                  np.arange(36).reshape(6, 6)[2:4, 2:4])
    # pad 6 -> 10 zero border
    p = np.asarray(center_crop_or_pad(a, (10, 10)))
    assert p.shape == (1, 10, 10, 1)
    np.testing.assert_array_equal(p[0, 2:8, 2:8, 0], np.arange(36).reshape(6, 6))
    assert p[0, 0].sum() == 0


def test_translation_consistency():
    # Fully-convolutional with valid convs + center-cropped skips (paper
    # variant): a whole-image pass and an overlap-tile pass must agree on the
    # shared output region. (The parity variant's zero-padded skips break
    # exact translation equivariance — part of the reference deviation,
    # SURVEY.md §2.1.)
    cfg = _tiny_cfg(skip_variant="paper")
    model = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 204, 204, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(params, x)           # 204 -> 20
    shifted = model.apply(params, x[:, 16:, 16:, :])  # 188 -> 4
    np.testing.assert_allclose(
        np.asarray(full)[:, 16:20, 16:20, :], np.asarray(shifted), rtol=2e-2, atol=2e-4
    )


def test_split_concat_conv_grads_match_concat_form():
    """split_concat_conv3x3's custom VJP (backward via the concat form's
    transposes) must equal the plain concat-conv gradients exactly."""
    from tpu_unet.models.unet import split_concat_conv3x3, _conv3x3_valid

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 10, 10, 6), jnp.float32)
    b = jnp.asarray(rng.randn(2, 10, 10, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 11, 8) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)

    def loss_split(a, b, k, bias):
        return jnp.sum(split_concat_conv3x3(a, b, k, bias) * g)

    def loss_concat(a, b, k, bias):
        cat = jnp.concatenate([a, b], axis=-1)
        return jnp.sum((_conv3x3_valid(cat, k) + bias) * g)

    np.testing.assert_allclose(
        np.asarray(loss_split(a, b, k, bias)),
        np.asarray(loss_concat(a, b, k, bias)), rtol=1e-6)
    gs = jax.grad(loss_split, argnums=(0, 1, 2, 3))(a, b, k, bias)
    gc = jax.grad(loss_concat, argnums=(0, 1, 2, 3))(a, b, k, bias)
    for got, want in zip(gs, gc):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_split_concat_model_grads_match_concat_model():
    """Full-model gradient equivalence: split_concat_conv=True vs False give
    identical grads (same parameter tree, same math)."""
    import dataclasses

    cfg = _tiny_cfg(split_concat_conv=True)
    model_s = UNet(cfg)
    model_c = UNet(dataclasses.replace(cfg, split_concat_conv=False))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 188, 188, 1), jnp.float32)
    params = model_s.init(jax.random.PRNGKey(0), x)

    def loss(m, p):
        return jnp.mean(m.apply(p, x) ** 2)

    gs = jax.grad(lambda p: loss(model_s, p))(params)
    gc = jax.grad(lambda p: loss(model_c, p))(params)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(gs)
    flat_c, _ = jax.tree_util.tree_flatten_with_path(gc)
    for (ks, vs), (_, vc) in zip(flat_s, flat_c):
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vc),
                                   rtol=1e-5, atol=1e-6, err_msg=str(ks))


def test_matmul_upconv_matches_conv_transpose():
    # upconv_impl='matmul' (one MXU dot + depth-to-space) is exactly
    # nn.ConvTranspose for the overlap-free 2x2/stride-2 case: same params,
    # same forward, same gradients.
    cfg_x = _tiny_cfg(upconv_impl="xla")
    cfg_m = _tiny_cfg(upconv_impl="matmul")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 188, 188, 1))
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x)
    y_x = UNet(cfg_x).apply(params, x)
    y_m = UNet(cfg_m).apply(params, x)  # identical param tree
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_x),
                               rtol=1e-5, atol=1e-5)

    def loss(model):
        def f(p):
            return jnp.sum(model.apply(p, x) ** 2)
        return f

    g_x = jax.grad(loss(UNet(cfg_x)))(params)
    g_m = jax.grad(loss(UNet(cfg_m)))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(g_m))
    for path, gx in flat_x:
        np.testing.assert_allclose(np.asarray(flat_m[path]), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=str(path))


def test_remat_is_pure_execution_choice():
    """ModelConfig.remat must not change the parameter tree, the forward, or
    the gradients (regression: the closure-only nn.remat call failed to bind
    the module scope and crashed at init until round 3)."""
    m0 = UNet(ModelConfig())
    m1 = UNet(ModelConfig(remat=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 188, 188, 1))
    p = m0.init(jax.random.PRNGKey(0), x)
    p1 = m1.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p1))
    np.testing.assert_allclose(np.asarray(m1.apply(p, x)),
                               np.asarray(m0.apply(p, x)), rtol=1e-6)
    g0 = jax.grad(lambda pp: (m0.apply(pp, x) ** 2).sum())(p)
    g1 = jax.grad(lambda pp: (m1.apply(pp, x) ** 2).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
