"""Geometric warps on device: Gaussian smoothing, bilinear resampling,
rotation, and Simard-style elastic deformation fields.

TPU-native replacements for the reference's host-side scipy pipeline
(SURVEY.md §2.13):
* ``scipy.ndimage.gaussian_filter(x, sigma, mode='constant')``
  (``data.py:238-239``) -> separable 1D convolutions with the same truncated
  kernel (truncate=4.0, radius = int(4*sigma + 0.5)).
* ``scipy.ndimage.map_coordinates(x, coords, order=1)`` (``data.py:245``)
  -> ``jax.scipy.ndimage.map_coordinates``.
* ``scipy.ndimage.rotate`` (``data.py:116-117``) -> rotation as a single
  bilinear gather about the center. Deviation (documented): the reference uses
  scipy's default cubic-spline interpolation; we use bilinear, which composes
  into one fused gather and changes only augmentation noise, not the loss/eval
  math covered by the bit-faithfulness target.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu_unet.ops.pad import fold_reflect


def _gaussian_kernel1d_np(sigma: float, truncate: float = 4.0):
    import numpy as np

    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Normalized 1D Gaussian taps matching scipy.ndimage._gaussian_kernel1d
    (order 0): radius = int(truncate * sigma + 0.5). Computed host-side
    (sigma is a static hyperparameter), returned as a device constant."""
    return jnp.asarray(_gaussian_kernel1d_np(sigma, truncate))


def gaussian_blur_matrix(n: int, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """[n, n] banded Toeplitz matrix B with B[i, j] = kernel[j - i + r]
    (zero outside the band): B @ x applies the truncated Gaussian along an
    axis with constant-0 boundary — exactly scipy's 'constant' mode, but as a
    dense MXU matmul instead of a 1-channel convolution (which TPUs execute
    on a catastrophically slow path: measured ~6 ms vs ~0.1 ms at 572^2)."""
    import numpy as np

    k = _gaussian_kernel1d_np(sigma, truncate)
    r = (len(k) - 1) // 2
    b = np.zeros((n, n), np.float32)
    for off in range(-r, r + 1):
        d = np.full(n - abs(off), k[off + r], np.float32)
        b += np.diag(d, off)
    return jnp.asarray(b)


def gaussian_filter(img: jax.Array, sigma: float, truncate: float = 4.0,
                    method: str = "matmul") -> jax.Array:
    """Separable Gaussian blur of a 2D image with constant-0 boundary,
    matching ``scipy.ndimage.gaussian_filter(img, sigma, mode='constant')``.

    method='matmul' (default): blur = Bv @ img @ Bh^T with banded blur
    matrices — rides the MXU. method='conv': 1-channel separable convolution
    (the correctness oracle; slow on TPU)."""
    if method == "matmul":
        h, w = img.shape
        bv = gaussian_blur_matrix(h, sigma, truncate)
        bh = gaussian_blur_matrix(w, sigma, truncate)
        x = img.astype(jnp.float32)
        return (bv @ x) @ bh.T
    k = gaussian_kernel1d(sigma, truncate)
    r = (k.shape[0] - 1) // 2
    x = img.astype(jnp.float32)[None, None, :, :]           # NCHW
    kv = k[None, None, :, None]                              # OIHW, vertical taps
    kh = k[None, None, None, :]                              # horizontal taps
    dn = lax.conv_dimension_numbers(x.shape, kv.shape, ("NCHW", "OIHW", "NCHW"))
    x = lax.conv_general_dilated(x, kv, (1, 1), [(r, r), (0, 0)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn)
    return x[0, 0]


def map_coordinates_bilinear(img: jax.Array, coords: Tuple[jax.Array, jax.Array],
                             cval: float = 0.0) -> jax.Array:
    """Bilinear resampling with constant fill, matching
    ``scipy.ndimage.map_coordinates(img, coords, order=1, mode='constant')``.

    scipy hard-fills `cval` for any coordinate outside [0, n-1] (no partial
    blending at the border band), whereas jax's implementation blends `cval`
    as a virtual neighbour — so we mask explicitly to scipy semantics.
    """
    ci, cj = coords
    out = jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32), [ci, cj], order=1, mode="constant", cval=cval,
    )
    h, w = img.shape
    inside = (ci >= 0) & (ci <= h - 1) & (cj >= 0) & (cj <= w - 1)
    return jnp.where(inside, out, cval)


def _bspline3_collocation_np(n: int):
    """[n, n] cubic B-spline collocation matrix with mirror boundary
    (c[-1] = c[1], c[n] = c[n-2]): row i is the stencil [1/6, 4/6, 1/6]
    sampling the coefficients that must reproduce the signal at knot i."""
    import numpy as np

    b = np.zeros((n, n), np.float64)
    for i in range(n):
        for off, wgt in ((-1, 1 / 6), (0, 4 / 6), (1, 1 / 6)):
            j = i + off
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * (n - 1) - j
            b[i, j] += wgt
    return b


def spline_filter_matrix(n: int) -> jnp.ndarray:
    """[n, n] dense cubic-spline prefilter F = B^-1: ``F @ x`` gives the
    B-spline coefficients whose spline interpolates x exactly at the knots,
    with mirror boundary — matching ``scipy.ndimage.spline_filter1d(order=3)``
    (which computes the same inverse via its causal/anticausal IIR). Dense
    matmul instead of a sequential scan: the sizes here are static and the
    MXU does the [n,n] @ [n,m] product in microseconds."""
    import numpy as np

    return jnp.asarray(np.linalg.inv(_bspline3_collocation_np(n)),
                       jnp.float32)


def _bspline3_weights(t: jax.Array):
    """Cubic B-spline basis values for taps at offsets (-1, 0, 1, 2) around
    the integer part, t = fractional part in [0, 1)."""
    t2 = t * t
    t3 = t2 * t
    w_m1 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
    w_0 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w_p1 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w_p2 = t3 / 6.0
    return (w_m1, w_0, w_p1, w_p2)


def _mirror_index(idx: jax.Array, n: int) -> jax.Array:
    """Reflect integer indices into [0, n-1] (mirror without edge repeat),
    matching the prefilter's boundary condition for near-edge taps."""
    idx = jnp.abs(idx)
    return jnp.where(idx >= n, 2 * (n - 1) - idx, idx)


def map_coordinates_cubic(img: jax.Array, coords: Tuple[jax.Array, jax.Array],
                          cval: float = 0.0,
                          prefiltered: bool = False) -> jax.Array:
    """Cubic B-spline resampling matching
    ``scipy.ndimage.map_coordinates(img, coords, order=3, mode='constant')``
    away from the border (scipy's 'constant'-mode prefilter itself uses
    mirror boundaries; exact parity holds for coordinates >= 1 knot inside,
    which is the only regime the augmentation pipeline samples — the
    reference reflect-pads generously before rotating, ``data.py:109-112``).

    Set prefiltered=True if `img` already holds spline coefficients
    (e.g. shared across several warps of the same source).
    """
    h, w = img.shape
    x = img.astype(jnp.float32)
    if not prefiltered:
        x = (spline_filter_matrix(h) @ x) @ spline_filter_matrix(w).T
    ci, cj = coords
    i0 = jnp.floor(ci).astype(jnp.int32)
    j0 = jnp.floor(cj).astype(jnp.int32)
    ti = ci - i0
    tj = cj - j0
    wi = _bspline3_weights(ti)
    wj = _bspline3_weights(tj)
    flat = x.reshape(-1)
    out = jnp.zeros(ci.shape, jnp.float32)
    rows = [_mirror_index(i0 + di, h) for di in (-1, 0, 1, 2)]
    cols = [_mirror_index(j0 + dj, w) for dj in (-1, 0, 1, 2)]
    for a in range(4):
        row_base = rows[a] * w
        for b in range(4):
            out = out + wi[a] * wj[b] * jnp.take(flat, row_base + cols[b])
    inside = (ci >= 0) & (ci <= h - 1) & (cj >= 0) & (cj <= w - 1)
    return jnp.where(inside, out, cval)


def rotation_coords(out_size: int, in_shape: Tuple[int, int], angle_deg: jax.Array
                    ) -> Tuple[jax.Array, jax.Array]:
    """Source coordinates sampling an `out_size`^2 window rotated by
    `angle_deg` (counterclockwise, scipy convention) about the input center.

    The output grid is centered on the input; equivalent to the reference's
    pad -> ``scipy.rotate(reshape=True)`` -> center-crop chain
    (``data.py:109-124``) when combined with reflect folding of the source
    coordinates (see `rotate_about_center`).
    """
    h, w = in_shape
    theta = jnp.deg2rad(angle_deg.astype(jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ci, cj = (h - 1) / 2.0, (w - 1) / 2.0
    oi = jnp.arange(out_size, dtype=jnp.float32) - (out_size - 1) / 2.0
    oj = jnp.arange(out_size, dtype=jnp.float32) - (out_size - 1) / 2.0
    gi, gj = jnp.meshgrid(oi, oj, indexing="ij")
    # Inverse rotation: output pixel pulls from R(-theta) * p.
    src_i = cos * gi + sin * gj + ci
    src_j = -sin * gi + cos * gj + cj
    return src_i, src_j


def rotate_about_center(img: jax.Array, angle_deg: jax.Array, out_size: int,
                        order: int = 1) -> jax.Array:
    """Rotate `img` about its center and return the central `out_size`^2
    window, reflect-folding source coordinates (multi-bounce, so the virtual
    reflect padding of ``data.py:109-112`` never materializes).

    order=1 bilinear (default, composes into the fused single-gather path);
    order=3 cubic B-spline — the reference's ``scipy.ndimage.rotate`` default
    (``data.py:116-117``). A/B measurement: results/r3/rotation_ab.md
    (60-epoch convergence: IoU delta +0.0009 for cubic = noise; bilinear
    stays the default at ~14x lower warp cost)."""
    si, sj = rotation_coords(out_size, img.shape, angle_deg)
    si = fold_reflect(si, img.shape[0])
    sj = fold_reflect(sj, img.shape[1])
    if order == 3:
        return map_coordinates_cubic(img, (si, sj))
    return map_coordinates_bilinear(img, (si, sj))


def elastic_fields(key: jax.Array, shape: Tuple[int, int], alpha: float,
                   sigma: float) -> Tuple[jax.Array, jax.Array]:
    """Simard-2003 elastic displacement fields, matching reference
    ``data.py:238-239``: dx = gaussian_filter(U(-1,1), sigma, constant) * alpha."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape, jnp.float32, -1.0, 1.0)
    u2 = jax.random.uniform(k2, shape, jnp.float32, -1.0, 1.0)
    dx = gaussian_filter(u1, sigma) * alpha
    dy = gaussian_filter(u2, sigma) * alpha
    return dx, dy


def elastic_warp(img: jax.Array, dx: jax.Array, dy: jax.Array) -> jax.Array:
    """Apply a displacement field: out[i, j] = img[i + dx, j + dy] bilinear,
    constant-0 outside (reference ``data.py:242-245``)."""
    h, w = img.shape
    gi, gj = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return map_coordinates_bilinear(img, (gi + dx, gj + dy))
