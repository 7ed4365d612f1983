"""Reflect padding and coordinate folding on device.

Replaces the reference's hand-rolled nine-slice mirror padding
(``data.py:249-277``, behaviour-equivalent to ``np.pad(mode='reflect')``) and
its generous over-padding before rotation (``data.py:109-112``,
``pad_width = input_size`` which *exceeds* the crop size, so numpy applies
repeated reflection).

Instead of materializing huge padded intermediates, `fold_reflect` maps any
out-of-range coordinate back into the image with multi-bounce reflection
(period 2*(n-1)); warps then gather straight from the original image. The
explicit `reflect_pad` (one gather) serves the inference path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_reflect(coord: jax.Array, n: int) -> jax.Array:
    """Fold coordinates into [0, n-1] by repeated reflection about the edges
    (no edge duplication — numpy 'reflect' mode). Works for float sampling
    coordinates and integer indices alike."""
    if n == 1:
        return jnp.zeros_like(coord)
    period = 2 * (n - 1)
    p = jnp.abs(coord) % period
    return jnp.minimum(p, period - p)


def reflect_pad(img: jax.Array, pad) -> jax.Array:
    """Reflect-pad the last two axes (any pad size, multi-bounce).

    `pad` is an int (same on all sides) or ((top, bottom), (left, right)).
    Equivalent to ``np.pad(img, pad, mode='reflect')`` on 2D input, including
    the reference's corner construction (``data.py:266-275``, reflecting the
    already-filled borders reproduces numpy's two-axis corner reflection).
    """
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    (pt, pb), (pl, pr) = pad
    h, w = img.shape[-2], img.shape[-1]
    rows = fold_reflect(jnp.arange(-pt, h + pb), h).astype(jnp.int32)
    cols = fold_reflect(jnp.arange(-pl, w + pr), w).astype(jnp.int32)
    return img[..., rows, :][..., :, cols]
