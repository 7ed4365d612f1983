"""Fused level-0 chain kernels (Pallas, round 3).

The serving profile (results/r2/stage_profile.txt) puts 55% of the int8
forward in the level-0 neighborhood, and every single-layer Pallas
replacement measured SLOWER than XLA there (results/r2/shootout_enc0.txt).
These layers are bandwidth/emitter-bound, not FLOP-bound — XLA's pool0 runs
~4x off HBM bandwidth and its 1->64 conv ~30x off — so the remaining lever is
fusing the *chain* to cut HBM roundtrips (VERDICT r2 item 2). Reference
workload: ``/root/reference/network.py:129-141`` (enc0 conv/conv/pool and the
dec0 concat path).

Kernels:

* ``enc0_chain(x, w1, b1, w2, b2)`` -> (skip, pooled): conv3x3(cin_small->C)
  + ReLU + conv3x3(C->C) + ReLU + 2x2/2 max-pool in ONE pass. The conv1
  intermediate lives only in VMEM (never hits HBM), the pool reads conv2's
  output from VMEM (XLA's pool0 re-reads 190 MB from HBM), and only the two
  tensors later layers actually consume are written: the pre-pool skip
  (paper-variant dec0 input) and the pooled map.
  - conv1 (1 input channel) is a VPU broadcast-FMA over the 9 taps — with
    cin=1 the MXU contraction is degenerate (XLA measures 1.9 T/s on it).
  - conv2 runs as 5 MXU dots with PAIRED taps: LHS = two dx/dy-shifted views
    channel-concatenated to K=2C (K=128 at C=64 — a full MXU contraction
    where the round-2 per-tap variants ran at K=64, half depth).
* ``concat_quantize(a, b, scale)``: the decoder's cat+requantize in one VPU
  pass — reads two bf16 halves, writes one int8 tensor. XLA's concat
  emitters measured 4-10x off bandwidth at these shapes
  (results/r2/shootout_pair0c.txt).

Numerics contract is tested against the XLA composition in
tests/test_fused_level0.py (exact for concat_quantize; conv chain matches the
bf16 XLA composition to accumulation tolerance).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_tap_pairs(w2: jax.Array) -> jax.Array:
    """[3, 3, C, C] -> [5, 2C, C]: taps (0,1), (2,3), (4,5), (6,7), (8, zero)
    stacked along the contraction dim so each conv2 dot runs at K=2C."""
    c = w2.shape[2]
    taps = w2.reshape(9, c, -1)
    taps = jnp.concatenate([taps, jnp.zeros_like(taps[:1])], axis=0)  # 10
    return taps.reshape(5, 2 * c, -1)


def _enc0_kernel(x_ref, w1_ref, b1_ref, w2p_ref, b2_ref, skip_ref, pool_ref,
                 h1_ref, h2_ref, *, bh: int, wo: int, c: int,
                 inv_skip_scale: float = 0.0):
    """One (bh+4)-row slab -> bh skip rows + bh/2 pooled rows.

    x_ref   [1, bh+4, wo+4]        f32 (single input channel)
    w1_ref  [9, c] f32   b1_ref [1, c] f32
    w2p_ref [5, 2c, c] bf16        (pair-packed taps)
    b2_ref  [1, c] f32
    skip_ref [1, bh, wo, c] bf16   pool_ref [1, bh//2, wo//2, c] bf16
    h1_ref  [bh+2, wo+2, c] bf16   (VMEM scratch: the conv1 intermediate)
    """
    # conv1 + ReLU: 9 broadcast-FMAs on the VPU. x slices broadcast along
    # the lane (channel) dim; weights broadcast along rows/cols.
    acc1 = jnp.zeros((bh + 2, wo + 2, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + bh + 2, dx:dx + wo + 2]       # [bh+2, wo+2]
            acc1 = acc1 + xs[:, :, None] * w1_ref[3 * dy + dx][None, None, :]
    h1_ref[...] = jnp.maximum(acc1 + b1_ref[0][None, None, :], 0.0
                              ).astype(jnp.bfloat16)

    # conv2 + ReLU: 5 pair-tap dots at K=2c.
    acc = None
    for p in range(5):
        ta, tb = 2 * p, 2 * p + 1
        ya, xa = ta // 3, ta % 3
        if tb < 9:
            yb, xb = tb // 3, tb % 3
            lhs = jnp.concatenate(
                [h1_ref[ya:ya + bh, xa:xa + wo, :],
                 h1_ref[yb:yb + bh, xb:xb + wo, :]], axis=-1)   # [bh, wo, 2c]
        else:
            lhs = jnp.concatenate(
                [h1_ref[ya:ya + bh, xa:xa + wo, :],
                 jnp.zeros((bh, wo, c), jnp.bfloat16)], axis=-1)
        d = lax.dot_general(lhs, w2p_ref[p],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    h2 = jnp.maximum(acc + b2_ref[0][None, None, :], 0.0)       # [bh, wo] f32
    h2_ref[...] = h2.astype(jnp.bfloat16)
    if inv_skip_scale:
        # paper-variant skip captured pre-quantized at the dec0 concat scale
        # (identical to quantize_activations on the bf16 skip): the int8
        # store halves the skip's HBM write AND its much-later dec0 read.
        skip_ref[0] = jnp.clip(jnp.round(h2 * inv_skip_scale),
                               0.0, 127.0).astype(jnp.int8)
    else:
        skip_ref[0] = h2_ref[...]

    # 2x2/2 max-pool from VMEM. The strided slices must read from a REF
    # (strided vector loads) — on a computed value they lower to a gather,
    # which Mosaic rejects ("Only 2D gather is supported").
    pool_ref[0] = jnp.maximum(
        jnp.maximum(h2_ref[0::2, 0::2, :], h2_ref[0::2, 1::2, :]),
        jnp.maximum(h2_ref[1::2, 0::2, :], h2_ref[1::2, 1::2, :]))


def enc0_chain(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
               b2: jax.Array, *, block_rows: int = 8,
               block_cols: int = 512,
               skip_scale: float = 0.0,
               interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """relu(conv1(x)), relu(conv2(.)) and its 2x2 max-pool in one fused pass.

    x [B, H, W, 1] f32/bf16; w1 [3, 3, 1, C]; w2 [3, 3, C, C].
    Returns (skip [B, H-4, W-4, C] bf16, pooled [B, (H-4)/2, (W-4)/2, C]).
    `skip_scale` > 0 stores the skip as int8 quantized by that scale
    (post-ReLU values are non-negative -> [0, 127]).

    VMEM budget note: the f32 accumulators pad C=64 to 128 lanes, so the
    per-block footprint is ~(2*bh+2) * bw * 128 * 4 B for accumulators plus
    the bf16 scratches — full serving width (1368) blows VMEM (the round-3
    shootout's Mosaic crashes); block_cols bounds it (512 -> ~10 MB)."""
    bsz, h, wd, cin = x.shape
    assert cin == 1, "enc0_chain fuses the single-channel stem"
    c = w1.shape[-1]
    ho, wo = h - 4, wd - 4
    assert ho % 2 == 0 and wo % 2 == 0, (ho, wo)

    bh = block_rows
    assert bh % 2 == 0 and block_cols % 16 == 0
    n_r = -(-ho // bh)
    ho_p = n_r * bh
    bw = min(block_cols, _round_up(wo, 16))
    n_w = -(-wo // bw)
    wo_p = n_w * bw
    x2 = x[..., 0]
    if wo_p + 4 > wd or ho_p > ho:
        x2 = jnp.pad(x2, ((0, 0), (0, ho_p - ho), (0, wo_p + 4 - wd)))

    # XLA pre-gathers overlapping (bh+4, bw+4) slabs (same trick as
    # ops/conv_tiles.py): the input is single-channel, so the halo
    # duplication costs ~2 B/px — negligible against plain VMEM BlockSpecs.
    slabs = jax.vmap(
        lambda b_: jnp.stack(
            [lax.dynamic_slice(x2[b_], (r * bh, q * bw), (bh + 4, bw + 4))
             for r in range(n_r) for q in range(n_w)]))(jnp.arange(bsz))
    slabs = slabs.reshape(bsz * n_r * n_w, bh + 4, bw + 4).astype(jnp.float32)

    w1f = w1.reshape(9, c).astype(jnp.float32)
    w2p = _pack_tap_pairs(w2.astype(jnp.bfloat16))
    b1f = b1.reshape(1, c).astype(jnp.float32)
    b2f = b2.reshape(1, c).astype(jnp.float32)

    kernel = functools.partial(_enc0_kernel, bh=bh, wo=bw, c=c,
                               inv_skip_scale=(1.0 / float(skip_scale)
                                               if skip_scale else 0.0))
    skip_dtype = jnp.int8 if skip_scale else jnp.bfloat16
    # 3D grid writing each block straight to its (b, r*bh, q*bw) window —
    # no post-hoc unblocking transpose (which would move the whole skip
    # tensor through HBM again).
    skip, pooled = pl.pallas_call(
        kernel,
        grid=(bsz, n_r, n_w),
        in_specs=[
            pl.BlockSpec((1, bh + 4, bw + 4),
                         lambda b, r, q: (b * n_r * n_w + r * n_w + q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bh, bw, c), lambda b, r, q: (b, r, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh // 2, bw // 2, c),
                         lambda b, r, q: (b, r, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ho_p, wo_p, c), skip_dtype),
            jax.ShapeDtypeStruct((bsz, ho_p // 2, wo_p // 2, c),
                                 jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((bh + 2, bw + 2, c), jnp.bfloat16),
                        pltpu.VMEM((bh, bw, c), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * (1 + c) * bsz * n_r * n_w * bh * bw,
            bytes_accessed=slabs.size * 4 + bsz * ho_p * wo_p * c * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(slabs, w1f, b1f, w2p, b2f)

    return skip[:, :ho, :wo], pooled[:, :ho // 2, :wo // 2]


def _concat_quant_kernel(a_ref, b_ref, o_ref, *, inv_scale: float):
    def q(ref):
        if ref.dtype == jnp.int8:      # already quantized at the same scale
            return ref[0]
        return jnp.clip(jnp.round(ref[0].astype(jnp.float32) * inv_scale),
                        -127.0, 127.0).astype(jnp.int8)

    # Build the 2C-lane value in registers and store ONCE: two separate
    # half-lane stores would each read-modify-write the full 128-lane tiles
    # (measured 31 GB/s vs XLA's 55 on the first hardware round).
    o_ref[0] = jnp.concatenate([q(a_ref), q(b_ref)], axis=-1)


def concat_quantize(a: jax.Array, b: jax.Array, scale: float, *,
                    block_rows: int = 8,
                    interpret: bool = False) -> jax.Array:
    """round(concat([a, b], -1) / scale) clamped to int8, in one VPU pass.

    a, b [B, H, W, C] bf16 (or int8, already at `scale`) -> [B, H, W, 2C]
    int8. The decoder's skip||upconv concat + requantize without
    materializing the bf16 concat (XLA emits the concat 4-10x off bandwidth
    at serving widths); an int8 input half is copied through unchanged.
    block_rows stays small: the block VMEM footprint is
    2 * br * W * C * 2B (inputs) + br * W * 2C (output), double-buffered —
    br=8 at W=1192, C=64 is ~7 MB; br >= 64 overruns VMEM (the round-3
    shootout's compile failures)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    bsz, h, wd, c = a.shape
    bh = min(block_rows, h)
    n_r = -(-h // bh)
    h_p = n_r * bh
    if h_p > h:
        pad = ((0, 0), (0, h_p - h), (0, 0), (0, 0))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)

    kernel = functools.partial(_concat_quant_kernel,
                               inv_scale=1.0 / float(scale))
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_r),
        in_specs=[
            pl.BlockSpec((1, bh, wd, c), lambda b_, r: (b_, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, wd, c), lambda b_, r: (b_, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, wd, 2 * c), lambda b_, r: (b_, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h_p, wd, 2 * c), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * a.size,
            bytes_accessed=4 * a.size + 2 * a.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a if a.dtype == jnp.int8 else a.astype(jnp.bfloat16),
      b if b.dtype == jnp.int8 else b.astype(jnp.bfloat16))
    return out[:, :h]
