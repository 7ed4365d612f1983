"""On-device augmentation pipeline.

The reference recomputes its augmentations per sample on the host with
numpy/scipy/cv2 inside ``__getitem__`` (``data.py:93-137``) — the dominant
cost of its training step (SURVEY.md §3.1). Here the whole chain runs jitted
on device over the resident image/label stacks:

  1. foreground-balanced weighted random crop: ``jax.random.categorical`` over
     precomputed per-image crop-origin log-probs (``data.py:98-103``), ±skip/2
     jitter, clamped;
  2. random rotation by a multiple of 30° about the crop center, sampled as a
     single bilinear gather with multi-bounce reflect folding — equivalent to
     the reference's reflect-pad -> scipy.rotate -> center-crop chain
     (``data.py:109-124``; interpolation is bilinear rather than scipy's
     default cubic, a documented deviation, see ops/warp.py);
  3. joint Simard elastic deformation of image+target with a shared smoothed
     displacement field (``data.py:127``, alpha=200, sigma=10);
  4. target: center-crop to the supervision window, re-binarize at 127
     (``data.py:129-133``); image: min/ptp normalize (``data.py:134``).

Output: network input [B, S, S, 1] f32 (S = input_size) and labels
[B, c, c] int32 (c = crop) — supervision only on the valid center window,
mirror-context around it (the paper's overlap-tile training recipe).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_unet.config import AugmentConfig
from tpu_unet.ops.pad import fold_reflect
from tpu_unet.ops.warp import (
    _bspline3_weights,
    _mirror_index,
    elastic_fields,
    elastic_warp,
    map_coordinates_bilinear,
    map_coordinates_cubic,
    rotate_about_center,
    spline_filter_matrix,
)


def _bilinear_multi(src: jax.Array, si: jax.Array, sj: jax.Array,
                    gather: str = "stacked") -> jax.Array:
    """Bilinear sample a channel-stacked source [H, W, C] at shared 2D
    coordinates (one flattened take for all channels — image and target share
    the crop/rotation/field, so sampling them together halves gather count).
    Coordinates must already be within [0, n-1] (post reflect-fold).

    gather='stacked' (default): concatenate the four neighbor-shifted copies
    of the flat source along channels and issue ONE take of [H*W, 4C] — the
    TPU gather's cost is per-point and channel-insensitive up to ~8 lanes
    (results/r3/gather_probe.txt), so this runs ~4x faster than
    gather='take4' (one take per bilinear tap) with bit-identical arithmetic.
    The rolls' wrapped tail rows are never addressed: base <= h*w - w - 2
    by the i0/j0 clamps."""
    h, w, c = src.shape
    i0 = jnp.clip(jnp.floor(si).astype(jnp.int32), 0, h - 2)
    j0 = jnp.clip(jnp.floor(sj).astype(jnp.int32), 0, w - 2)
    fi = (si - i0)[..., None]
    fj = (sj - j0)[..., None]
    flat = src.reshape(h * w, -1)
    base = i0 * w + j0
    if gather == "take4":
        v00 = jnp.take(flat, base, axis=0)
        v01 = jnp.take(flat, base + 1, axis=0)
        v10 = jnp.take(flat, base + w, axis=0)
        v11 = jnp.take(flat, base + w + 1, axis=0)
    else:
        nb = jnp.concatenate(
            [flat, jnp.roll(flat, -1, axis=0), jnp.roll(flat, -w, axis=0),
             jnp.roll(flat, -(w + 1), axis=0)], axis=1)       # [h*w, 4c]
        g = jnp.take(nb, base, axis=0)
        v00, v01 = g[..., 0:c], g[..., c:2 * c]
        v10, v11 = g[..., 2 * c:3 * c], g[..., 3 * c:]
    return (v00 * (1 - fi) * (1 - fj) + v01 * (1 - fi) * fj
            + v10 * fi * (1 - fj) + v11 * fi * fj)


def _cubic_multi(coeffs: jax.Array, si: jax.Array, sj: jax.Array) -> jax.Array:
    """Cubic B-spline sample of channel-stacked prefiltered coefficients
    [H, W, C] at shared 2D coordinates (16 taps, mirror-folded near edges)."""
    h, w, _ = coeffs.shape
    i0 = jnp.floor(si).astype(jnp.int32)
    j0 = jnp.floor(sj).astype(jnp.int32)
    wi = _bspline3_weights(si - i0)
    wj = _bspline3_weights(sj - j0)
    flat = coeffs.reshape(h * w, -1)
    out = jnp.zeros(si.shape + (coeffs.shape[-1],), jnp.float32)
    for a in range(4):
        row = _mirror_index(i0 + (a - 1), h) * w
        for b in range(4):
            taps = jnp.take(flat, row + _mirror_index(j0 + (b - 1), w), axis=0)
            out = out + (wi[a] * wj[b])[..., None] * taps
    return out


def _fused_rotate_elastic_multi(src: jax.Array, angle_deg: jax.Array,
                                dx: jax.Array, dy: jax.Array,
                                canvas_size: int, order: int = 1,
                                gather: str = "stacked") -> jax.Array:
    """`_fused_rotate_elastic` for a channel-stacked source [H, W, C] with one
    shared gather (see `_bilinear_multi`); order=3 samples the composite
    coordinate with the cubic B-spline kernel (prefiltered coefficients)."""
    h, w, _ = src.shape
    gi = jnp.arange(canvas_size, dtype=jnp.float32)[:, None]
    gj = jnp.arange(canvas_size, dtype=jnp.float32)[None, :]
    pi = gi + dx
    pj = gj + dy
    inb = ((pi >= 0) & (pi <= canvas_size - 1)
           & (pj >= 0) & (pj <= canvas_size - 1))
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    co = (canvas_size - 1) / 2.0
    ci, cj = (h - 1) / 2.0, (w - 1) / 2.0
    qi = pi - co
    qj = pj - co
    si = fold_reflect(cos * qi + sin * qj + ci, h)
    sj = fold_reflect(-sin * qi + cos * qj + cj, w)
    if order == 3:
        fv, fh = spline_filter_matrix(h), spline_filter_matrix(w)
        # coeffs[i,j,c] = sum_mn FV[i,m] FH[j,n] src[m,n,c]
        coeffs = jnp.tensordot(
            fv, jnp.tensordot(fh, src.astype(jnp.float32), axes=((1,), (1,))),
            axes=((1,), (1,)))
        val = _cubic_multi(coeffs, si, sj)
    else:
        val = _bilinear_multi(src, si, sj, gather=gather)
    return jnp.where(inb[..., None], val, 0.0)


def _fused_rotate_elastic(img: jax.Array, angle_deg: jax.Array,
                          dx: jax.Array, dy: jax.Array,
                          canvas_size: int, offset: int = 0,
                          out_size: int = None) -> jax.Array:
    """One-gather composition of the reference's rotate -> elastic chain:
    out(p) = rotated(p + d), rotated(q) = img[fold(R(q - c_out) + c_in)],
    with the elastic warp's constant-0 fill outside the rotated canvas
    (``data.py:115-127`` semantics; single bilinear sample of the composite
    coordinate instead of bilinear-of-bilinear — see AugmentConfig.fused_warp).

    `canvas_size` is the virtual rotated-canvas extent (the network input
    size); `offset`/`out_size` restrict evaluation to a window of it — the
    label is only supervised on the center crop, so warping it outside that
    window is wasted gather work. `dx`/`dy` must already be the window slice.
    """
    h, w = img.shape
    out_size = canvas_size if out_size is None else out_size
    gi = (jnp.arange(out_size, dtype=jnp.float32) + offset)[:, None]
    gj = (jnp.arange(out_size, dtype=jnp.float32) + offset)[None, :]
    pi = gi + dx
    pj = gj + dy
    inb = ((pi >= 0) & (pi <= canvas_size - 1)
           & (pj >= 0) & (pj <= canvas_size - 1))
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    co = (canvas_size - 1) / 2.0
    ci, cj = (h - 1) / 2.0, (w - 1) / 2.0
    qi = pi - co
    qj = pj - co
    si = fold_reflect(cos * qi + sin * qj + ci, h)
    sj = fold_reflect(-sin * qi + cos * qj + cj, w)
    val = map_coordinates_bilinear(img, (si, sj))
    return jnp.where(inb, val, 0.0)


def _augment_one(
    image: jax.Array,         # [H, W] f32
    target: jax.Array,        # [H, W] f32 in {0, 255}
    log_probs: jax.Array,     # [P]
    key: jax.Array,
    *,
    pairs: jax.Array,         # [P, 2] int32
    crop: int,
    input_size: int,
    alpha: float,
    sigma: float,
    rotate_step: int,
    skip: int,
    fused_warp: bool,
    rotate_order: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    k_crop, k_jit, k_rot, k_elastic = jax.random.split(key, 4)

    # 1. weighted random crop origin + jitter (data.py:98-103)
    cid = jax.random.categorical(k_crop, log_probs)
    origin = pairs[cid]
    jitter = jax.random.randint(k_jit, (2,), -(skip // 2), skip // 2 + 1)
    origin = origin + jitter
    max_y = image.shape[0] - crop
    max_x = image.shape[1] - crop
    oy = jnp.clip(origin[0], 0, max_y)
    ox = jnp.clip(origin[1], 0, max_x)
    img_c = jax.lax.dynamic_slice(image, (oy, ox), (crop, crop))
    tgt_c = jax.lax.dynamic_slice(target, (oy, ox), (crop, crop))

    # 2+3. rotation about the crop center (reflect-folded context) composed
    # with the joint elastic deformation (shared field).
    n_angles = 360 // rotate_step
    angle = (jax.random.randint(k_rot, (), 0, n_angles) * rotate_step).astype(jnp.float32)
    dx, dy = elastic_fields(k_elastic, (input_size, input_size), alpha, sigma)
    pad = (input_size - crop) // 2
    if fused_warp:
        # Image and target share crop/angle/field: one stacked gather for both
        # (gather cost is per-point, nearly channel-insensitive).
        src = jnp.stack([img_c, tgt_c], axis=-1)
        out = _fused_rotate_elastic_multi(src, angle, dx, dy, input_size,
                                          order=rotate_order)
        inp = out[..., 0]
        gt_w = jax.lax.dynamic_slice(out[..., 1], (pad, pad), (crop, crop))
    else:
        img_r = rotate_about_center(img_c, angle, input_size, order=rotate_order)
        tgt_r = rotate_about_center(tgt_c, angle, input_size, order=rotate_order)
        inp = elastic_warp(img_r, dx, dy)
        tgt_w = elastic_warp(tgt_r, dx, dy)
        gt_w = jax.lax.dynamic_slice(tgt_w, (pad, pad), (crop, crop))

    # 4. binarize supervision window; normalize input
    gt = (gt_w > 127.0).astype(jnp.int32)
    # guard: a constant crop (flat image region) has ptp 0 -> NaN inputs
    # would silently poison the whole run (same guard as infer/tiles.py)
    inp = (inp - jnp.min(inp)) / jnp.maximum(jnp.ptp(inp), 1e-12)
    return inp[..., None], gt


class AugmentPipeline:
    """Jit-compiled batched augmentation over device-resident stacks."""

    def __init__(self, aug: AugmentConfig):
        self.aug = aug
        self.crop = aug.crop
        self.input_size = aug.input_size
        self._fn = jax.jit(
            partial(
                self._batch,
                crop=self.crop,
                input_size=self.input_size,
                alpha=aug.elastic_alpha,
                sigma=aug.elastic_sigma,
                rotate_step=aug.rotate_step_deg,
                skip=aug.crop_grid_skip,
                fused_warp=aug.fused_warp,
                rotate_order=aug.rotate_order,
            )
        )

    @staticmethod
    def _batch(images, targets, log_probs, pairs, indices, key, **kw):
        keys = jax.random.split(key, indices.shape[0])
        fn = partial(_augment_one, pairs=pairs, **kw)
        return jax.vmap(fn)(
            images[indices], targets[indices], log_probs[indices], keys
        )

    def __call__(self, images, targets, log_probs, pairs, indices, key):
        """images/targets [N,H,W], log_probs [N,P], pairs [P,2], indices [B],
        key -> (inputs [B,S,S,1] f32, labels [B,c,c] i32)."""
        return self._fn(images, targets, log_probs, pairs,
                        jnp.asarray(indices, jnp.int32), key)
