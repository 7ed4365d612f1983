"""Fused level-0 chain kernels (Pallas, round 3).

The serving profile (results/r2/stage_profile.txt) puts 55% of the int8
forward in the level-0 neighborhood, and every single-layer Pallas
replacement measured SLOWER than XLA there (results/r2/shootout_enc0.txt).
These layers are bandwidth/emitter-bound, not FLOP-bound — XLA's pool0 runs
~4x off HBM bandwidth and its 1->64 conv ~30x off — so the remaining lever was
fusing the *chain* to cut HBM roundtrips (VERDICT r2 item 2). Reference
workload: ``/root/reference/network.py:129-141`` (enc0 conv/conv/pool and the
dec0 concat path).

**MEASURED NEGATIVE — research path, default OFF.** The final hardware
shootout (results/r3/fused_level0_shootout4.txt, b8x1372) has the best
compiling fused config at 104.3 ms vs 29.7 ms for XLA's composed emitters
(3.5x slower; the fused concat 14.5 vs 8.1 ms), and the in-kernel pool modes
fail remote compilation outright. Mosaic's generated code at these
shallow-channel shapes loses more than the saved HBM roundtrips gain —
the same emitter gap as the round-2 single-layer kernels. Level 0 ships on
XLA; these kernels stay as the tested record of the fused-chain experiment
(`ResearchQuantInference(fused_enc0=True, fused_concat=True)`
(infer/quant_research.py) exercises them
end-to-end, tests/test_quant.py::test_fused_level0_forward_matches_unfused).

Formulation notes (results/r3/mosaic_probe.txt + mosaic_probe3.txt — what
this remote Mosaic toolchain accepts): keep channels on the LANE dim and
spatial W on sublanes, reshape ref/dot values to 2D before ``dot_general``,
stage shifted windows through VMEM scratch (64-lane-offset scratch stores
compile), and never (a) rank-expand with broadcasts, (b) lane-shift a 2D
array whose lanes are spatial, (c) stride sublanes. The original
broadcast-FMA + strided-pool kernel failed remote compilation at every
shape; the pieces used here each probe COMPILES+RUNS.

Kernels:

* ``enc0_chain(x, w1, b1, w2, b2)`` -> (skip, pooled): conv3x3(1->C) + ReLU
  + conv3x3(C->C) + ReLU + 2x2/2 max-pool in ONE pass. The conv1
  intermediate lives only in VMEM (never hits HBM), the pool reads conv2's
  output from VMEM (XLA's pool0 re-reads ~190 MB from HBM), and only the two
  tensors later layers consume are written: the pre-pool skip (paper-variant
  dec0 input, optionally already int8-quantized) and the pooled map.
  - conv1: the host builds a 9-tap im2col view (taps on lanes), the kernel
    runs ONE 2D dot [rows*cols, 9] @ [9, C] (probe A).
  - conv2: rows3 staging — im2col buffer [bh, bw, 3C] written as three
    64-lane-offset scratch stores per dy, then a 2D dot at K=3C (probe C;
    the same pattern as ops/conv_tiles.py's rows3 variant).
  - pool: column pairs via the 2D lane-doubling reshape [R, C] -> [R/2, 2C]
    (row-major adjacency makes lane halves the (2j, 2j+1) columns), row
    pairs via leading-dim strided reads of a scratch ref. ``pool_mode``
    falls back to "cols" (XLA finishes rows) or "none" (XLA pools the skip)
    if the remote toolchain rejects either atom.
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


def _enc0_kernel(s_ref, w1_ref, b1_ref, w2_ref, b2_ref, skip_ref, pool_ref,
                 h1_ref, buf_ref, cm_ref, *, bh: int, bw: int, c: int,
                 pool_mode: str, inv_skip_scale: float = 0.0):
    """One block: s_ref [1, bh+2, bw+2, 9] (conv1 im2col taps on lanes) ->
    skip [1, bh, bw, c] + pooled output (shape depends on pool_mode).

    w1_ref [9, c] f32; b1_ref [1, c] f32; w2_ref [3, 3c, c] bf16 (rows3
    layout: w2_ref[dy][dx*c + i][o]); b2_ref [1, c] f32.
    h1_ref [bh+2, bw+2, c] bf16 scratch; buf_ref [bh, bw, 3c] bf16 scratch;
    cm_ref [bh, bw//2, c] f32 scratch (pool staging).
    """
    n_r, n_c = bh + 2, bw + 2
    # conv1 + ReLU: one 2D dot, K=9 (probe A)
    a1 = lax.dot_general(
        s_ref[0].reshape(n_r * n_c, 9), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a1 = jnp.maximum(a1 + b1_ref[0][None, :], 0.0)
    h1_ref[...] = a1.reshape(n_r, n_c, c).astype(jnp.bfloat16)

    # conv2 + ReLU: rows3 staging, 3 dots at K=3c (probe C)
    acc = None
    for dy in range(3):
        for dx in range(3):
            buf_ref[:, :, dx * c:(dx + 1) * c] = (
                h1_ref[dy:dy + bh, dx:dx + bw, :])
        d = lax.dot_general(
            buf_ref[...].reshape(bh * bw, 3 * c), w2_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    h2 = jnp.maximum(acc + b2_ref[0][None, :], 0.0)        # [bh*bw, c] f32

    if inv_skip_scale:
        # paper-variant skip captured pre-quantized at the dec0 concat scale
        # (identical to quantize_activations on the bf16 skip): the int8
        # store halves the skip's HBM write AND its much-later dec0 read.
        skip_ref[0] = jnp.clip(jnp.round(h2 * inv_skip_scale), 0.0, 127.0
                               ).astype(jnp.int8).reshape(bh, bw, c)
    else:
        skip_ref[0] = h2.astype(jnp.bfloat16).reshape(bh, bw, c)

    if pool_mode == "none":
        return
    # column-pair max via the 2D lane-doubling reshape: row-major rows of h2
    # are (i, j) pixels, so [bh*bw, c] -> [bh*bw/2, 2c] puts columns (2j,
    # 2j+1) of the same image row on lane halves (bw even: pairs never
    # straddle rows).
    v = h2.reshape(bh * bw // 2, 2 * c)
    cm = jnp.maximum(v[:, :c], v[:, c:])                   # [bh*(bw/2), c]
    if pool_mode == "cols":
        pool_ref[0] = cm.astype(jnp.bfloat16).reshape(bh, bw // 2, c)
        return
    # row-pair max via leading-dim strided reads of a scratch ref
    cm_ref[...] = cm.reshape(bh, bw // 2, c)
    m = jnp.maximum(cm_ref[0::2, :, :], cm_ref[1::2, :, :])
    pool_ref[0] = m.astype(jnp.bfloat16)


def enc0_chain(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
               b2: jax.Array, *, block_rows: int = 8,
               block_cols: int = 256,
               skip_scale: float = 0.0,
               pool_mode: str = "fused",
               interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """relu(conv1(x)), relu(conv2(.)) and its 2x2 max-pool in one fused pass.

    x [B, H, W, 1] f32/bf16; w1 [3, 3, 1, C]; w2 [3, 3, C, C].
    Returns (skip [B, H-4, W-4, C] bf16 — int8 if `skip_scale` > 0 — and
    pooled [B, (H-4)/2, (W-4)/2, C] bf16). Post-ReLU values are
    non-negative so the int8 skip clamps to [0, 127].

    pool_mode: "fused" pools fully in-kernel; "cols" emits the column-pooled
    [B, H-4, (W-4)/2, C] map and lets XLA finish the (cheap, leading-dim)
    row max; "none" skips pooling (caller pools the skip). Fallbacks exist
    because the remote Mosaic toolchain rejects several reshape/stride
    forms (results/r3/mosaic_probe3.txt).

    VMEM note: the conv1 im2col block [bh+2, bw+2, 9] pads its 9 lanes to
    128 in VMEM, and the rows3 buffer is [bh, bw, 3C]; block_cols=256 keeps
    the total under ~8 MB at C=64.
    """
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

    # XLA-side block gather + 9-tap im2col (taps on the LANE dim so the
    # kernel's conv1 is a plain 2D dot): slabs9[n, i, j, t] =
    # x[b, r*bh + i + t//3, q*bw + j + t%3] for the (bh+2, bw+2) conv1
    # output window of block (b, r, q). ~9x input bytes in HBM — x is
    # single-channel f32 so this is small against the chain's skip+pool
    # writes; measured as part of the e2e candidate.
    slabs = jax.vmap(
        lambda b_: jnp.stack(
            [lax.dynamic_slice(x2[b_], (r * bh, q * bw), (bh + 4, bw + 4))
             for r in range(n_r) for q in range(n_w)]))(jnp.arange(bsz))
    slabs = slabs.reshape(bsz * n_r * n_w, bh + 4, bw + 4)
    slabs9 = jnp.stack(
        [slabs[:, dy:dy + bh + 2, dx:dx + bw + 2]
         for dy in range(3) for dx in range(3)],
        axis=-1).astype(jnp.float32)          # [N, bh+2, bw+2, 9]

    w1f = w1.reshape(9, c).astype(jnp.float32)
    w2r = w2.astype(jnp.bfloat16).reshape(3, 3 * c, c)
    b1f = b1.reshape(1, c).astype(jnp.float32)
    b2f = b2.reshape(1, c).astype(jnp.float32)

    kernel = functools.partial(_enc0_kernel, bh=bh, bw=bw, c=c,
                               pool_mode=pool_mode,
                               inv_skip_scale=(1.0 / float(skip_scale)
                                               if skip_scale else 0.0))
    skip_dtype = jnp.int8 if skip_scale else jnp.bfloat16
    if pool_mode == "cols":
        pool_block = (1, bh, bw // 2, c)
        pool_shape = (bsz, ho_p, wo_p // 2, c)
    else:
        pool_block = (1, bh // 2, bw // 2, c)
        pool_shape = (bsz, ho_p // 2, wo_p // 2, c)
    # 3D grid writing each block straight to its (b, r*bh, q*bw) window —
    # no post-hoc unblocking transpose (which would move the whole skip
    # tensor through HBM again).
    skip, pooled = pl.pallas_call(
        kernel,
        grid=(bsz, n_r, n_w),
        in_specs=[
            pl.BlockSpec((1, bh + 2, bw + 2, 9),
                         lambda b, r, q: (b * n_r * n_w + r * n_w + q,
                                          0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bh, bw, c), lambda b, r, q: (b, r, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pool_block, lambda b, r, q: (b, r, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ho_p, wo_p, c), skip_dtype),
            jax.ShapeDtypeStruct(pool_shape, jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, bw + 2, c), jnp.bfloat16),
            pltpu.VMEM((bh, bw, 3 * c), jnp.bfloat16),
            pltpu.VMEM((bh, bw // 2, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * c * (1 + c) * bsz * n_r * n_w * bh * bw,
            bytes_accessed=slabs9.size * 4 + bsz * ho_p * wo_p * c * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(slabs9, w1f, b1f, w2r, b2f)

    skip = skip[:, :ho, :wo]
    if pool_mode == "cols":
        cm = pooled[:, :ho, :wo // 2]
        pooled = jnp.maximum(cm[:, 0::2], cm[:, 1::2])
    elif pool_mode == "none":
        sk = skip.astype(jnp.bfloat16)
        pooled = lax.reduce_window(sk, -jnp.inf, lax.max, (1, 2, 2, 1),
                                   (1, 2, 2, 1), "VALID")
    else:
        pooled = pooled[:, :ho // 2, :wo // 2]
    return skip, pooled


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
    br=8 at W=1192, C=64 is ~7 MB; br >= 16 overruns VMEM (the round-3
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
