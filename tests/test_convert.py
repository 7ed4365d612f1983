"""Torch-checkpoint conversion: per-layer layout transforms validated
numerically against torch, then a full converted model forward."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_unet.config import ModelConfig
from tpu_unet.convert import (
    NAME_MAP,
    conv_weight_to_kernel,
    convtranspose_weight_to_kernel,
    params_from_torch_state_dict,
)
from tpu_unet.models import UNet


def test_conv_layout_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 10, 12).astype(np.float32)       # NCHW
    w = rng.randn(8, 3, 3, 3).astype(np.float32)         # OIHW
    b = rng.randn(8).astype(np.float32)
    expected = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()

    conv = nn.Conv(8, (3, 3), padding="VALID")
    params = {"params": {"kernel": jnp.asarray(conv_weight_to_kernel(w)),
                         "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), expected,
                               rtol=1e-4, atol=1e-5)


def test_convtranspose_layout_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 9).astype(np.float32)
    w = rng.randn(6, 4, 2, 2).astype(np.float32)         # [I, O, kH, kW]
    b = rng.randn(4).astype(np.float32)
    expected = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                                  torch.tensor(b), stride=2).numpy()

    up = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    params = {"params": {"kernel": jnp.asarray(
        convtranspose_weight_to_kernel(w).copy()), "bias": jnp.asarray(b)}}
    got = up.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), expected,
                               rtol=1e-4, atol=1e-5)


def _random_reference_state_dict(seed=0):
    """A state_dict with the reference's layer names/shapes (network.py:23-58)
    and random values — shape-only stand-in for a real checkpoint."""
    rng = np.random.RandomState(seed)
    widths = [64, 128, 256, 512, 1024]
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(o, i, k, k).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.tensor(rng.randn(o).astype(np.float32) * 0.05)

    def upconv(name, i, o):
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(i, o, 2, 2).astype(np.float32) * 0.05)
        sd[f"{name}.bias"] = torch.tensor(rng.randn(o).astype(np.float32) * 0.05)

    conv("conv11c", 1, 64, 3); conv("conv12c", 64, 64, 3)
    conv("conv21c", 64, 128, 3); conv("conv22c", 128, 128, 3)
    conv("conv31c", 128, 256, 3); conv("conv32c", 256, 256, 3)
    conv("conv41c", 256, 512, 3); conv("conv42c", 512, 512, 3)
    conv("conv51c", 512, 1024, 3); conv("conv52c", 1024, 1024, 3)
    upconv("upconv4", 1024, 512)
    conv("conv41e", 1024, 512, 3); conv("conv42e", 512, 512, 3)
    upconv("upconv3", 512, 256)
    conv("conv31e", 512, 256, 3); conv("conv32e", 256, 256, 3)
    upconv("upconv2", 256, 128)
    conv("conv21e", 256, 128, 3); conv("conv22e", 128, 128, 3)
    upconv("upconv1", 128, 64)
    conv("conv11e", 128, 64, 3); conv("conv12e", 64, 64, 3)
    conv("finalconv", 64, 2, 1)
    return sd


def test_full_state_dict_converts_and_runs():
    sd = _random_reference_state_dict()
    params = params_from_torch_state_dict(sd)
    assert set(params["params"].keys()) == {v for v, _ in NAME_MAP.values()}
    model = UNet(ModelConfig(skip_variant="parity"))
    x = jnp.zeros((1, 188, 188, 1), jnp.float32)
    out = model.apply(jax.tree.map(jnp.asarray, params), x)
    assert out.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_missing_key_raises():
    sd = _random_reference_state_dict()
    del sd["conv11c.weight"]
    try:
        params_from_torch_state_dict(sd)
        assert False, "should have raised"
    except KeyError as e:
        assert "conv11c" in str(e)


def test_state_dict_roundtrip():
    """state_dict_from_params is the exact inverse of
    params_from_torch_state_dict (torch .pth export capability)."""
    from tpu_unet.convert import state_dict_from_params

    sd = _random_reference_state_dict(seed=5)
    params = params_from_torch_state_dict(sd)
    sd2 = state_dict_from_params(params)
    import torch as _t
    for k, v in sd.items():
        np.testing.assert_array_equal(
            np.asarray(v.numpy() if isinstance(v, _t.Tensor) else v),
            sd2[k], err_msg=k)
