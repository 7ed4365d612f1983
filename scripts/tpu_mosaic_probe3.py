"""Round-3 Mosaic probe #3: reformulated enc0-chain pieces built ONLY from
patterns proven to compile in ops/conv_tiles.py (which Mosaic accepts at
these shapes). The first probe (tpu_mosaic_probe.py) showed the original
pieces fail: rank-expanding broadcasts, lane-dim window shifts (single-channel
x kept W on lanes), sublane-strided pools. Each candidate here keeps channels
on lanes, spatial W on sublanes, and reshapes to 2D before dots.

Usage: python scripts/tpu_mosaic_probe3.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())

    def probe(name, fn, oracle=None, atol=2e-2):
        try:
            out = fn()
            outs = out if isinstance(out, tuple) else (out,)
            for o in outs:
                float(jnp.sum(o.astype(jnp.float32)))
            if oracle is not None:
                ref = oracle()
                refs = ref if isinstance(ref, tuple) else (ref,)
                errs = [float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                              - r.astype(jnp.float32))))
                        for o, r in zip(outs, refs)]
                log(f"  {name}: COMPILES+RUNS  max|err|={max(errs):.2e}"
                    + ("" if max(errs) <= atol else "  ** MISMATCH **"))
            else:
                log(f"  {name}: COMPILES+RUNS")
            return True
        except Exception as e:
            log(f"  {name}: FAIL {type(e).__name__}: {str(e)[:110]}")
            return False

    bh, bw, c = 8, 512, 64
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def call(kernel, ins, outs, scratch=()):
        return pl.pallas_call(
            kernel,
            out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
            out_specs=(tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                             for _ in outs)
                       if isinstance(outs, tuple)
                       else pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=list(scratch),
        )(*ins)

    # ---- A. conv1 as ONE 2D dot over a lane-major 9-tap im2col -------------
    # slab9 [rows, cols, 9] (lane dim = taps, built by XLA outside), w [9, c].
    rows, cols = bh + 2, bw + 2
    slab9 = jax.random.normal(k1, (rows, cols, 9), jnp.float32)
    w9 = jax.random.normal(k2, (9, c), jnp.float32) * 0.1

    def k_conv1_dot(s_ref, w_ref, o_ref):
        acc = lax.dot_general(
            s_ref[...].reshape(rows * cols, 9), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = jnp.maximum(acc.reshape(rows, cols, c),
                                 0.0).astype(jnp.bfloat16)

    probe("A conv1-im2col-2Ddot", lambda: call(
        k_conv1_dot, (slab9, w9),
        jax.ShapeDtypeStruct((rows, cols, c), jnp.bfloat16)),
        oracle=lambda: jnp.maximum(
            jnp.einsum("rct,tk->rck", slab9, w9), 0.0).astype(jnp.bfloat16))

    # shared conv2 fixtures: h1 [bh+2, bw+2, c] bf16, torch-layout taps
    h1 = (jax.random.normal(k3, (bh + 2, bw + 2, c), jnp.float32) * 0.5)
    h1 = jnp.maximum(h1, 0.0).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (3, 3, c, c), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)

    def conv2_oracle():
        y = lax.conv_general_dilated(
            h1[None].astype(jnp.float32), w2.astype(jnp.float32), (1, 1),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[0]

    # ---- B. conv2 nconcat, dx blocks zero-padded to 128 lanes --------------
    # w2cat[dy] [c, 3*128]: block dx occupies lanes [dx*128, dx*128+c).
    w2cat = jnp.zeros((3, c, 3 * 128), jnp.bfloat16)
    for dy in range(3):
        for dx in range(3):
            w2cat = w2cat.at[dy, :, dx * 128:dx * 128 + c].set(w2[dy, dx])

    def k_conv2_nconcat(h_ref, w_ref, o_ref):
        acc = None
        for dy in range(3):
            xs = h_ref[dy:dy + bh, :, :]                      # [bh, bw+2, c]
            y = lax.dot_general(
                xs, w_ref[dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [bh, bw+2, 384]
            for dx in range(3):
                d = y[:, dx:dx + bw, dx * 128:dx * 128 + c]
                acc = d if acc is None else acc + d
        o_ref[...] = acc.astype(jnp.float32)

    probe("B conv2-nconcat-pad128", lambda: call(
        k_conv2_nconcat, (h1, w2cat),
        jax.ShapeDtypeStruct((bh, bw, c), jnp.float32)),
        oracle=conv2_oracle, atol=1e-1)

    # ---- C. conv2 rows3: buf scratch [bh, bw, 3c], 64-lane-offset stores ---
    w2r = w2.reshape(3, 3 * c, c)          # [dy][dx*c + i][o]

    def k_conv2_rows3(h_ref, w_ref, o_ref, buf_ref):
        acc = None
        for dy in range(3):
            for dx in range(3):
                buf_ref[:, :, dx * c:(dx + 1) * c] = (
                    h_ref[dy:dy + bh, dx:dx + bw, :])
            d = lax.dot_general(
                buf_ref[...].reshape(bh * bw, 3 * c),
                w_ref[dy],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[...] = acc.reshape(bh, bw, c)

    probe("C conv2-rows3-buf", lambda: call(
        k_conv2_rows3, (h1, w2r),
        jax.ShapeDtypeStruct((bh, bw, c), jnp.float32),
        scratch=[pltpu.VMEM((bh, bw, 3 * c), jnp.bfloat16)]),
        oracle=conv2_oracle, atol=1e-1)

    # ---- D. conv2 im2col9: buf [bh, bw, 9c], one K=576 dot -----------------
    w2f = w2.reshape(9 * c, c)

    def k_conv2_im2col(h_ref, w_ref, o_ref, buf_ref):
        for dy in range(3):
            for dx in range(3):
                t = (dy * 3 + dx) * c
                buf_ref[:, :, t:t + c] = h_ref[dy:dy + bh, dx:dx + bw, :]
        o_ref[...] = lax.dot_general(
            buf_ref[...].reshape(bh * bw, 9 * c), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(bh, bw, c)

    probe("D conv2-im2col9", lambda: call(
        k_conv2_im2col, (h1, w2f),
        jax.ShapeDtypeStruct((bh, bw, c), jnp.float32),
        scratch=[pltpu.VMEM((bh, bw, 9 * c), jnp.bfloat16)]),
        oracle=conv2_oracle, atol=1e-1)

    # ---- E. pool via reshape trick (no sublane striding) -------------------
    # rows: leading-dim stride-2 slices (untiled dim); cols: reshape
    # [bh//2, bw, c] -> [bh//2, bw//2, 2c] puts column pairs on lane halves.
    hp = jnp.abs(jax.random.normal(k1, (bh, bw, c), jnp.float32)
                 ).astype(jnp.bfloat16)

    def k_pool_reshape(h_ref, o_ref):
        m = jnp.maximum(h_ref[0::2, :, :], h_ref[1::2, :, :])  # [bh/2, bw, c]
        v = m.reshape(bh // 2, bw // 2, 2 * c)
        o_ref[...] = jnp.maximum(v[:, :, :c], v[:, :, c:])

    def pool_oracle():
        r = hp.astype(jnp.float32)
        return jnp.max(r.reshape(bh // 2, 2, bw // 2, 2, c),
                       axis=(1, 3)).astype(jnp.bfloat16)

    probe("E pool-reshape-lanehalf", lambda: call(
        k_pool_reshape, (hp,),
        jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16)),
        oracle=pool_oracle, atol=0.0)

    # ---- F. pool from SCRATCH ref (the fused-chain usage) ------------------
    def k_pool_scratch(h_ref, o_ref, s_ref):
        s_ref[...] = h_ref[...]
        m = jnp.maximum(s_ref[0::2, :, :], s_ref[1::2, :, :])
        v = m.reshape(bh // 2, bw // 2, 2 * c)
        o_ref[...] = jnp.maximum(v[:, :, :c], v[:, :, c:])

    probe("F pool-reshape-from-scratch", lambda: call(
        k_pool_scratch, (hp,),
        jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16),
        scratch=[pltpu.VMEM((bh, bw, c), jnp.bfloat16)]),
        oracle=pool_oracle, atol=0.0)

    # ---- G. assembled chain piece: conv1-dot -> scratch -> nconcat conv2
    #         -> skip store + pool store (multi-output) ----------------------
    slab9b = jax.random.normal(k1, (bh + 4, bw + 4, 9), jnp.float32)

    def k_chain(s_ref, w1_ref, w2_ref, skip_ref, pool_ref, h1_ref):
        n_r, n_c = bh + 2, bw + 2
        a1 = lax.dot_general(
            s_ref[1:1 + n_r, 1:1 + n_c, :].reshape(n_r * n_c, 9), w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h1_ref[...] = jnp.maximum(a1.reshape(n_r, n_c, c),
                                  0.0).astype(jnp.bfloat16)
        acc = None
        for dy in range(3):
            xs = h1_ref[dy:dy + bh, :, :]
            y = lax.dot_general(
                xs, w2_ref[dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for dx in range(3):
                d = y[:, dx:dx + bw, dx * 128:dx * 128 + c]
                acc = d if acc is None else acc + d
        h2 = jnp.maximum(acc, 0.0)
        skip_ref[...] = h2.astype(jnp.bfloat16)
        m = jnp.maximum(h2[0::2, :, :], h2[1::2, :, :])
        v = m.reshape(bh // 2, bw // 2, 2 * c)
        pool_ref[...] = jnp.maximum(v[:, :, :c], v[:, :, c:]
                                    ).astype(jnp.bfloat16)

    def chain_oracle():
        a1 = jnp.einsum("rct,tk->rck",
                        slab9b[1:bh + 3, 1:bw + 3, :], w9)
        h1o = jnp.maximum(a1, 0.0)
        y = lax.conv_general_dilated(
            h1o[None], w2.astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        h2 = jnp.maximum(y, 0.0)
        pool = jnp.max(h2.reshape(bh // 2, 2, bw // 2, 2, c), axis=(1, 3))
        return (h2.astype(jnp.bfloat16), pool.astype(jnp.bfloat16))

    probe("G chain-conv1-conv2-pool", lambda: call(
        k_chain, (slab9b, w9, w2cat),
        (jax.ShapeDtypeStruct((bh, bw, c), jnp.bfloat16),
         jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16)),
        scratch=[pltpu.VMEM((bh + 2, bw + 2, c), jnp.bfloat16)]),
        oracle=chain_oracle, atol=2e-1)

    # ---- H. chain with int8 skip store (serving form) ----------------------
    def k_chain_q(s_ref, w1_ref, w2_ref, skip_ref, pool_ref, h1_ref):
        n_r, n_c = bh + 2, bw + 2
        a1 = lax.dot_general(
            s_ref[1:1 + n_r, 1:1 + n_c, :].reshape(n_r * n_c, 9), w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h1_ref[...] = jnp.maximum(a1.reshape(n_r, n_c, c),
                                  0.0).astype(jnp.bfloat16)
        acc = None
        for dy in range(3):
            xs = h1_ref[dy:dy + bh, :, :]
            y = lax.dot_general(
                xs, w2_ref[dy],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for dx in range(3):
                d = y[:, dx:dx + bw, dx * 128:dx * 128 + c]
                acc = d if acc is None else acc + d
        h2 = jnp.maximum(acc, 0.0)
        skip_ref[...] = jnp.clip(jnp.round(h2 * 37.5), 0.0, 127.0
                                 ).astype(jnp.int8)
        m = jnp.maximum(h2[0::2, :, :], h2[1::2, :, :])
        v = m.reshape(bh // 2, bw // 2, 2 * c)
        pool_ref[...] = jnp.maximum(v[:, :, :c], v[:, :, c:]
                                    ).astype(jnp.bfloat16)

    probe("H chain+int8skip", lambda: call(
        k_chain_q, (slab9b, w9, w2cat),
        (jax.ShapeDtypeStruct((bh, bw, c), jnp.int8),
         jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16)),
        scratch=[pltpu.VMEM((bh + 2, bw + 2, c), jnp.bfloat16)]))


if __name__ == "__main__":
    main()
