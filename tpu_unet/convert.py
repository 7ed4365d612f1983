"""Convert reference PyTorch U-Net checkpoints to tpu_unet parameters.

The reference ships pretrained ``state_dict`` checkpoints per dataset
(``data.py:433-452``, loaded at ``main_main.py:277``). This maps them onto the
Flax parameter tree so existing reference users can carry their trained
models across (use ``skip_variant='parity'`` for output-faithful inference —
the checkpoints were trained with the as-implemented skip geometry,
SURVEY.md §2.1).

Layer-name mapping (reference ``network.py:23-58`` -> models/unet.py) and the
layout transforms:
* ``nn.Conv2d``          weight [O, I, kH, kW] -> kernel [kH, kW, I, O]
* ``nn.ConvTranspose2d`` weight [I, O, kH, kW] -> kernel [kH, kW, I, O],
  spatially flipped (torch's conv_transpose correlates with the kernel
  mirrored relative to flax's ``lax.conv_transpose`` convention; validated
  numerically in tests/test_convert.py).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

# reference layer name -> (flax module name, is_transpose)
NAME_MAP: Dict[str, tuple] = {
    "conv11c": ("enc0_conv1", False), "conv12c": ("enc0_conv2", False),
    "conv21c": ("enc1_conv1", False), "conv22c": ("enc1_conv2", False),
    "conv31c": ("enc2_conv1", False), "conv32c": ("enc2_conv2", False),
    "conv41c": ("enc3_conv1", False), "conv42c": ("enc3_conv2", False),
    "conv51c": ("bottleneck_conv1", False), "conv52c": ("bottleneck_conv2", False),
    "upconv4": ("up3", True),
    "conv41e": ("dec3_conv1", False), "conv42e": ("dec3_conv2", False),
    "upconv3": ("up2", True),
    "conv31e": ("dec2_conv1", False), "conv32e": ("dec2_conv2", False),
    "upconv2": ("up1", True),
    "conv21e": ("dec1_conv1", False), "conv22e": ("dec1_conv2", False),
    "upconv1": ("up0", True),
    "conv11e": ("dec0_conv1", False), "conv12e": ("dec0_conv2", False),
    "finalconv": ("head", False),
}


def conv_weight_to_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def convtranspose_weight_to_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kH, kW] -> flax ConvTranspose
    [kH, kW, I, O] with spatial flip."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]


def params_from_torch_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> dict:
    """Build the Flax ``{'params': {...}}`` tree from a reference state_dict
    (values may be torch tensors or numpy arrays)."""
    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    params: dict = {}
    for ref_name, (flax_name, is_t) in NAME_MAP.items():
        wkey, bkey = f"{ref_name}.weight", f"{ref_name}.bias"
        if wkey not in state_dict:
            raise KeyError(f"missing {wkey} in state_dict — not a reference "
                           f"U-Net checkpoint?")
        w = to_np(state_dict[wkey])
        kernel = (convtranspose_weight_to_kernel(w) if is_t
                  else conv_weight_to_kernel(w))
        params[flax_name] = {
            "kernel": np.ascontiguousarray(kernel),
            "bias": to_np(state_dict[bkey]),
        }
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth`` state_dict into Flax params (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return params_from_torch_state_dict(sd)


def kernel_to_conv_weight(k: np.ndarray) -> np.ndarray:
    """flax [kH, kW, I, O] -> torch Conv2d [O, I, kH, kW]."""
    return np.transpose(k, (3, 2, 0, 1))


def kernel_to_convtranspose_weight(k: np.ndarray) -> np.ndarray:
    """flax ConvTranspose [kH, kW, I, O] (pre-flipped) -> torch
    ConvTranspose2d [I, O, kH, kW]."""
    return np.transpose(np.ascontiguousarray(k[::-1, ::-1]), (2, 3, 0, 1))


def state_dict_from_params(params: Mapping) -> Dict[str, "np.ndarray"]:
    """Inverse of ``params_from_torch_state_dict``: export tpu_unet params as
    a reference-named torch-layout state_dict (numpy values; pass through
    ``torch.save`` for a reference-consumable ``.pth``). Lets users move
    models trained here back to the reference's torch stack."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    for ref_name, (flax_name, is_t) in NAME_MAP.items():
        if flax_name not in p:
            raise KeyError(f"params missing {flax_name!r} — width/depth "
                           f"mismatch with the reference topology?")
        k = np.asarray(p[flax_name]["kernel"], np.float32)
        sd[f"{ref_name}.weight"] = (kernel_to_convtranspose_weight(k) if is_t
                                    else kernel_to_conv_weight(k))
        sd[f"{ref_name}.bias"] = np.asarray(p[flax_name]["bias"], np.float32)
    return sd
