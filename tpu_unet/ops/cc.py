"""Connected components on device (4-connectivity).

TPU-native replacement for ``cv.connectedComponents(x, connectivity=4)`` as
used inside the reference weight-map computation (``functions.py:47``) — it
must run *inside the jitted train step* because augmentation (rotation /
elastic warps) changes label topology per sample, so host-side precomputation
is impossible.

Algorithm: iterative min-label propagation. Each foreground pixel starts with
its linear index as label; every sweep takes the elementwise minimum over the
4-neighbourhood (masked to foreground) until a fixed point. Converges in
O(longest geodesic path) sweeps — bounded by H*W in theory, tens in practice
for cell masks — under a `lax.while_loop` with an exact convergence check
(data-dependent trip count is fine under jit; every sweep is static-shape VPU
work).

Label *values* are component minima (arbitrary but deterministic); the
reference only uses labels to split per-object planes, so any labeling with
the same partition is behaviour-equivalent (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Plain Python int: a module-level ``jnp.int32`` constant would initialise the
# JAX backend at import time (a ~60-115 s TPU session grab, and an import-time
# crash whenever the single-client chip is held elsewhere). ``jnp.full_like``
# accepts the int directly.
_SENTINEL = 2 ** 30


def _neighbor_min(lab: jax.Array) -> jax.Array:
    """Elementwise min over the 4-neighbourhood (edges padded with sentinel)."""
    up = jnp.concatenate([lab[1:], jnp.full_like(lab[:1], _SENTINEL)], axis=0)
    down = jnp.concatenate([jnp.full_like(lab[:1], _SENTINEL), lab[:-1]], axis=0)
    left = jnp.concatenate([lab[:, 1:], jnp.full_like(lab[:, :1], _SENTINEL)], axis=1)
    right = jnp.concatenate([jnp.full_like(lab[:, :1], _SENTINEL), lab[:, :-1]], axis=1)
    return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))


def connected_components(fg: jax.Array) -> jax.Array:
    """Label 4-connected components of a boolean mask.

    fg: [H, W] bool. Returns [H, W] int32: background pixels hold the sentinel
    2^30; each component's pixels all hold the component's minimum linear
    index.
    """
    h, w = fg.shape
    idx = lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    lab0 = jnp.where(fg, idx, _SENTINEL)

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        lab, _ = state
        nxt = jnp.where(fg, jnp.minimum(lab, _neighbor_min(lab)), _SENTINEL)
        return nxt, jnp.any(nxt != lab)

    lab, _ = lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    return lab


def component_planes(
    fg: jax.Array, max_objects: int
) -> Tuple[jax.Array, jax.Array]:
    """Split a mask into per-component binary planes with a static bound.

    Returns (planes [max_objects, H, W] bool, num_objects scalar int32).
    Components beyond `max_objects` are dropped (log-free static truncation;
    choose the bound above the dataset's worst case — HeLa crops carry ~<=20
    cells). Unused planes are all-False.

    This is the static-shape equivalent of the reference's dynamic per-object
    channel split (``functions.py:50-52``).
    """
    lab = connected_components(fg)
    # Component ids ascending, without a sort: labels are component-min
    # linear indices, so the K smallest distinct values fall out of K
    # masked full-plane min reductions (jnp.unique lowers to a full bitonic
    # sort of H*W elements on TPU — measured ~10x the cost of this scan,
    # results/r3/weights_profile.txt). Identical ids: both produce the K
    # smallest distinct labels, with _SENTINEL fill when fewer exist.
    def _next_id(prev, _):
        nxt = jnp.min(jnp.where(lab > prev, lab, _SENTINEL))
        return nxt, nxt

    _, ids = lax.scan(_next_id, -jnp.int32(1), None, length=max_objects)
    valid = ids != _SENTINEL
    planes = (lab[None, :, :] == ids[:, None, None]) & valid[:, None, None]
    num = jnp.sum(valid.astype(jnp.int32))
    return planes, num
