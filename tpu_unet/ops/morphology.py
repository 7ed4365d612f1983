"""Morphological ops on device.

Replaces the reference's OpenCV host calls (SURVEY.md §2.13):
* ``cv.dilate(x, 5x5 rect, iterations=2)`` in GT preprocessing
  (``data.py:206-213``) -> windowed max via ``lax.reduce_window``.
* ``cv.threshold(x, t, 255, THRESH_BINARY)`` (``data.py:64,132,163,186``)
  -> ``jnp.where``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dilate(img: jax.Array, ksize: int = 5, iterations: int = 1) -> jax.Array:
    """Grayscale dilation with a ksize x ksize rectangular structuring element,
    zero-padded at the border (OpenCV uses the border replicate... for binary
    masks with zero background the result is identical; we dilate masks only).
    """
    pad = ksize // 2
    out = img
    for _ in range(iterations):
        out = lax.reduce_window(
            out,
            -jnp.inf if jnp.issubdtype(out.dtype, jnp.floating) else jnp.iinfo(out.dtype).min,
            lax.max,
            window_dimensions=(ksize, ksize),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
        )
    return out


def binary_threshold(img: jax.Array, thresh: float, maxval: float = 255.0) -> jax.Array:
    """cv.THRESH_BINARY: maxval where img > thresh else 0."""
    return jnp.where(img > thresh, jnp.asarray(maxval, img.dtype), jnp.asarray(0, img.dtype))
