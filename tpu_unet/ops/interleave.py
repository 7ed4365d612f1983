"""Batch<->channel pairing as Pallas copy kernels.

The level-0 pairing trick (infer/quant_research.py `pair_level0`) folds two batch
images into the channel dim so XLA's 128-lane padding of 64-channel convs
does useful work. The catch, measured: XLA's strided channel-slice +
batch-concat emitters run 4-10x off HBM bandwidth (unpair of [8,604²,128]
bf16 = 8.7 ms for 0.7 GB; pair of [16,1032²,64] = 18 ms —
results/r2/shootout_pair0c.txt). These kernels do the same data movement as
VMEM-staged DMA copies.

Mosaic requires BlockSpec blocks to span full (or 128-aligned) minor
dimensions, so every block here is full-width in both W and C; the
64-channel halves are addressed with static slices *inside* the kernel
(vector-layout ops, which have no such restriction).

No reference counterpart (TPU-serving plumbing; the reference is eager
torch, ``network.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(h: int, w: int, c: int, itemsize: int,
               budget: int = 4 << 20) -> int:
    rows = max(1, budget // max(1, w * c * itemsize))
    while h % rows:
        rows -= 1
    return rows


def _pair_kernel(a_ref, b_ref, o_ref):
    c = a_ref.shape[-1]
    o_ref[..., :c] = a_ref[...]
    o_ref[..., c:] = b_ref[...]


def pair_batch_channels(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """[B, H, W, C] -> [B/2, H, W, 2C]: image i shares a row with image
    i + B/2 in the channel dim (out[i, ..., :C] = x[i], out[i, ..., C:] =
    x[i + B/2])."""
    b, h, w, c = x.shape
    assert b % 2 == 0, b
    hb = b // 2
    rows = _row_block(h, w, 2 * c, x.dtype.itemsize)
    spec_lo = pl.BlockSpec((1, rows, w, c), lambda i, r: (i, r, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_hi = pl.BlockSpec((1, rows, w, c),
                           lambda i, r, hb=hb: (i + hb, r, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pair_kernel,
        grid=(hb, h // rows),
        in_specs=[spec_lo, spec_hi],
        out_specs=pl.BlockSpec((1, rows, w, 2 * c),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, h, w, 2 * c), x.dtype),
        interpret=interpret,
    )(x, x)


def _unpair_kernel(x_ref, o_ref):
    c = o_ref.shape[-1]
    p = pl.program_id(0)
    o_ref[...] = jnp.where(p == 0, x_ref[..., :c], x_ref[..., c:])


def unpair_batch_channels(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """[B/2, H, W, 2C] -> [B, H, W, C]: inverse of `pair_batch_channels`."""
    hb, h, w, c2 = x.shape
    assert c2 % 2 == 0, c2
    c = c2 // 2
    rows = _row_block(h, w, c2, x.dtype.itemsize)
    return pl.pallas_call(
        _unpair_kernel,
        grid=(2, hb, h // rows),
        in_specs=[pl.BlockSpec((1, rows, w, c2),
                               lambda p, i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, w, c),
                               lambda p, i, r, hb=hb: (p * hb + i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * hb, h, w, c), x.dtype),
        interpret=interpret,
    )(x)


def _interleave_kernel(a_ref, b_ref, o_ref):
    c = a_ref.shape[-1] // 2
    o_ref[..., 0 * c:1 * c] = a_ref[..., :c]
    o_ref[..., 1 * c:2 * c] = b_ref[..., :c]
    o_ref[..., 2 * c:3 * c] = a_ref[..., c:]
    o_ref[..., 3 * c:4 * c] = b_ref[..., c:]


def interleave_pairs(a: jax.Array, b: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """Paired concat: a = [a0|a1], b = [b0|b1] (each [B/2, H, W, 2C]) ->
    [B/2, H, W, 4C] with per-image channel layout [a_i | b_i], i.e.
    channels [a0, b0, a1, b1]. The paired form of concat([a_img, b_img], -1)
    for each image."""
    hb, h, w, c2 = a.shape
    assert a.shape == b.shape and c2 % 2 == 0
    rows = _row_block(h, w, 4 * c2, a.dtype.itemsize)
    spec_in = pl.BlockSpec((1, rows, w, c2), lambda i, r: (i, r, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _interleave_kernel,
        grid=(hb, h // rows),
        in_specs=[spec_in, spec_in],
        out_specs=pl.BlockSpec((1, rows, w, 2 * c2),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hb, h, w, 2 * c2), a.dtype),
        interpret=interpret,
    )(a, b)
