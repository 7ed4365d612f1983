"""Exact Euclidean distance transform (EDT) on device.

TPU-native replacement for ``cv.distanceTransform(x, cv.DIST_L2, maskSize=0)``
as used by the reference weight maps (``functions.py:58``; the ``uint8 - 1``
trick there makes object pixels the zero set, so the transform measures the
distance from every pixel to the nearest object pixel).

Algorithm: exact two-phase separable EDT.

Phase 1 (rows) is fully data-parallel via cumulative min/max scans: for each
pixel, the distance to the nearest object pixel *within its row* comes from a
forward cummax of object indices and a backward cummin.

Phase 2 (columns) evaluates D^2[i, j] = min_r ( g[r, j]^2 + (i - r)^2 )
exactly with a `lax.scan` over source rows r, keeping a running elementwise
minimum over the whole [H, W] plane. O(H^2 W) work but branch-free, fully
vectorized VPU arithmetic with static shapes — the TPU-friendly formulation of
Felzenszwalb's lower-envelope pass (which is inherently sequential and
data-dependent). Exactness: phase 2 scans *all* source rows, so no envelope
pruning is needed for correctness.

Pixels with no object anywhere in the plane get +inf (the weight-map consumer
turns exp(-inf) into 0; see losses/weights.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _row_distance(mask: jax.Array) -> jax.Array:
    """Per-row 1D distance to the nearest True pixel in the same row.

    mask: [H, W] bool. Returns [H, W] f32 (inf where the row has no True).
    """
    h, w = mask.shape
    col = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # Nearest True at or to the left: running max of column index over Trues.
    left = lax.cummax(jnp.where(mask, col, -1), axis=1)
    d_left = jnp.where(left >= 0, (col - left).astype(jnp.float32), jnp.inf)
    # Nearest True at or to the right: running min (reversed cummax trick).
    big = jnp.int32(2 ** 30)
    right = lax.cummin(jnp.where(mask, col, big), axis=1, reverse=True)
    d_right = jnp.where(right < big, (right - col).astype(jnp.float32), jnp.inf)
    return jnp.minimum(d_left, d_right)


def _column_pass_from_g2(g2: jax.Array) -> jax.Array:
    """Exact (min, +) reduction over source rows (lax.scan formulation).

    g2: [H, W] f32 squared per-row distances (phase 1). Returns [H, W] f32
    squared Euclidean distances D^2[i, j] = min_r (g2[r, j] + (i - r)^2).
    """
    h, w = g2.shape
    rows = jnp.arange(h, dtype=jnp.float32)

    def step(acc, r):
        row_g2, r_idx = r
        di = rows - r_idx                       # [H]
        cand = di * di
        cand = cand[:, None] + row_g2[None, :]  # [H, W]
        return jnp.minimum(acc, cand), None

    init = jnp.full((h, w), jnp.inf, dtype=jnp.float32)
    acc, _ = lax.scan(step, init, (g2, rows))
    return acc


def _column_pass_banded_from_g2(g2: jax.Array, band: int) -> jax.Array:
    """Banded (min, +): D^2[i, j] = min_{|d| <= band} (g2[i+d, j] + d^2),
    scanning offsets of an inf-padded source (the XLA/CPU twin of the Pallas
    banded kernel; exact wherever the true D^2 <= band^2)."""
    h, w = g2.shape
    g2p = jnp.pad(g2, ((band, band), (0, 0)), constant_values=jnp.inf)

    def step(acc, d):
        seg = lax.dynamic_slice(g2p, (d, 0), (h, w))
        off = (d - band).astype(jnp.float32)
        return jnp.minimum(acc, seg + off * off), None

    init = jnp.full((h, w), jnp.inf, dtype=jnp.float32)
    acc, _ = lax.scan(step, init, jnp.arange(2 * band + 1))
    return acc


def edt(mask: jax.Array) -> jax.Array:
    """Exact Euclidean distance from every pixel to the nearest True pixel.

    mask: [H, W] bool (the "object"). Returns [H, W] f32; 0 on the object,
    +inf if the mask is empty. Matches ``cv.distanceTransform`` with
    ``DIST_L2, maskSize=0`` on the complement encoding used by the reference.
    """
    g = _row_distance(mask)
    g2 = jnp.where(jnp.isinf(g), jnp.inf, g * g)
    return jnp.sqrt(_column_pass_from_g2(g2))


def edt_batch(masks: jax.Array, use_pallas: bool | None = None,
              interpret: bool = False, num_valid=None,
              band: int | None = None) -> jax.Array:
    """[N, H, W] bool -> [N, H, W] f32 exact EDT.

    On TPU the column pass runs as a VMEM-resident Pallas kernel
    (ops/edt_pallas.py) — the scan formulation drags the full [N, H, W]
    accumulator through HBM on each of H steps; the kernel touches HBM twice
    per plane. CPU/interpret falls back to the scan (also the test oracle).

    `num_valid` (traced scalar ok): planes at index >= num_valid are known
    empty (static padding) and shortcut to +inf in the Pallas path.

    `band` (static): restrict the column pass to vertical offsets <= band.
    Distances whose true value exceeds `band` may come back larger (up to
    +inf); exact below it. Cuts column-pass work H/(2*band+1)-fold — used by
    the weight maps, whose border term is exp(-d^2/50) and hence zero to
    float precision beyond d ~ 30 (losses/weights.py).
    """
    g = jax.vmap(_row_distance)(masks)
    g2 = jnp.where(jnp.isinf(g), jnp.inf, g * g)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from tpu_unet.ops.edt_pallas import column_pass_pallas

        d2 = column_pass_pallas(g2, num_valid=num_valid, band=band,
                                interpret=interpret)
    elif band is not None:
        d2 = jax.vmap(lambda x: _column_pass_banded_from_g2(x, band))(g2)
    else:
        d2 = jax.vmap(_column_pass_from_g2)(g2)
    return jnp.sqrt(d2)
