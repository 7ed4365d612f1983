"""Model-level parity proof: the 'parity' skip variant with converted torch
weights reproduces the reference network's forward pass.

The oracle is an independent torch-functional re-derivation of the reference
topology from SURVEY.md §2.1 (23 conv layers; skips captured AFTER max-pool;
skip zero-padded up to the decoder size before concatenation; ReLU everywhere
except the 1x1 head) — written directly against the state_dict tensors, no
nn.Module classes."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig
from tpu_unet.convert import params_from_torch_state_dict
from tpu_unet.models import UNet
from tests.test_convert import _random_reference_state_dict


def _torch_oracle_forward(sd, x):
    """x: [1, 1, H, W] float tensor -> [1, 2, h, w] logits."""

    def conv(name, t):
        return F.conv2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"])

    def up(name, t):
        return F.conv_transpose2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"],
                                  stride=2)

    def pad_to(a, b):
        # zero-pad (or crop) a's spatial dims to b's; the as-implemented
        # geometry always pads because skips are captured post-pool.
        c = int((a.shape[-1] - b.shape[-1]) * 0.5)
        return F.pad(a, (-c, -c, -c, -c))

    t = x
    skips = []
    enc = [("conv11c", "conv12c"), ("conv21c", "conv22c"),
           ("conv31c", "conv32c"), ("conv41c", "conv42c")]
    for c1, c2 in enc:
        t = F.relu(conv(c1, t))
        t = F.relu(conv(c2, t))
        t = F.max_pool2d(t, 2, 2)
        skips.append(t)                       # post-pool capture
    t = F.relu(conv("conv51c", t))
    t = F.relu(conv("conv52c", t))
    dec = [("upconv4", "conv41e", "conv42e"), ("upconv3", "conv31e", "conv32e"),
           ("upconv2", "conv21e", "conv22e"), ("upconv1", "conv11e", "conv12e")]
    for (u, c1, c2), skip in zip(dec, reversed(skips)):
        t = up(u, t)
        t = torch.cat([pad_to(skip, t), t], dim=1)
        t = F.relu(conv(c1, t))
        t = F.relu(conv(c2, t))
    return conv("finalconv", t)


def test_parity_model_matches_torch_oracle():
    sd = _random_reference_state_dict(seed=5)
    rng = np.random.RandomState(0)
    x = rng.rand(1, 1, 188, 188).astype(np.float32)

    with torch.no_grad():
        expected = _torch_oracle_forward(sd, torch.tensor(x)).numpy()

    params = jax.tree.map(jnp.asarray, params_from_torch_state_dict(sd))
    model = UNet(ModelConfig(skip_variant="parity"))
    got = np.asarray(model.apply(params, jnp.asarray(np.moveaxis(x, 1, -1))))
    got = np.moveaxis(got, -1, 1)

    assert got.shape == expected.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_paper_variant_differs_from_as_implemented():
    # Sanity: the two skip geometries are genuinely different programs.
    sd = _random_reference_state_dict(seed=6)
    params = jax.tree.map(jnp.asarray, params_from_torch_state_dict(sd))
    x = jnp.asarray(np.random.RandomState(1).rand(1, 188, 188, 1), jnp.float32)
    y_par = UNet(ModelConfig(skip_variant="parity")).apply(params, x)
    y_pap = UNet(ModelConfig(skip_variant="paper")).apply(params, x)
    assert not np.allclose(np.asarray(y_par), np.asarray(y_pap), atol=1e-3)
