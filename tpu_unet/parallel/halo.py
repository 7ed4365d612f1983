"""Spatial (strip) parallelism with halo exchange — the convnet counterpart
of sequence/context parallelism (SURVEY.md §2.14, §5.7).

One large image is sharded by rows across the ``spatial`` mesh axis. Each
device computes the valid U-Net output for its strip; the 3x3 valid convs
need ``context/2`` (= 92 for depth 4) rows of receptive-field halo on each
side, exchanged with ring neighbours via ``lax.ppermute`` inside
``shard_map``. Edge devices mirror-pad locally instead (they own the image
border, so the reflection is exact). Columns are fully resident per device
and mirror-padded locally.

Constraints (asserted): strip height must be a valid U-Net *output* size
(strip + context is then a valid input size), and >= context/2 so a single
ring hop supplies the halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_unet.core.geometry import CONTEXT, output_size_for_input


def _mirror_rows_top(strip: jax.Array, pad: int) -> jax.Array:
    """First `pad` rows of np.pad(strip, reflect) above row 0: rows pad..1."""
    return strip[1:pad + 1][::-1]


def _mirror_rows_bottom(strip: jax.Array, pad: int) -> jax.Array:
    return strip[-pad - 1:-1][::-1]


def halo_strip_inference(model, mesh: Mesh, strip_h: int, width: int,
                         axis: str = "spatial"):
    """Build a sharded whole-image forward: image [n*strip_h, width] f32
    (already normalized) -> class logits [n*strip_h, width, C].

    The image must be sharded by rows over `axis`; output comes back sharded
    the same way.
    """
    pad = CONTEXT // 2
    n = mesh.shape[axis]
    # strip + context must be a valid input size; raises otherwise.
    output_size_for_input(strip_h + CONTEXT)
    output_size_for_input(width + CONTEXT)
    if strip_h <= pad:
        raise ValueError(
            f"strip height {strip_h} <= halo {pad}: single-hop ppermute cannot "
            f"supply the receptive field (and edge mirrors need pad+1 rows); "
            f"use fewer devices or larger strips")

    def strip_fn(params, strip):
        # strip: [strip_h, width] — this device's rows.
        i = lax.axis_index(axis)
        fwd_perm = [(j, j + 1) for j in range(n - 1)]   # send downward
        bwd_perm = [(j + 1, j) for j in range(n - 1)]   # send upward
        # Halo from the device above: its bottom `pad` rows.
        from_above = lax.ppermute(strip[-pad:], axis, fwd_perm)
        # Halo from the device below: its top `pad` rows.
        from_below = lax.ppermute(strip[:pad], axis, bwd_perm)
        top = jnp.where(i == 0, _mirror_rows_top(strip, pad), from_above)
        bottom = jnp.where(i == n - 1, _mirror_rows_bottom(strip, pad), from_below)
        x = jnp.concatenate([top, strip, bottom], axis=0)  # [strip_h + 2*pad, W]
        # Columns: fully local, mirror both sides.
        cols = jnp.concatenate(
            [x[:, 1:pad + 1][:, ::-1], x, x[:, -pad - 1:-1][:, ::-1]], axis=1
        )
        logits = model.apply(params, cols[None, :, :, None])
        return logits[0]                                  # [strip_h, W, C]

    sharded = shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)
