"""Bisect remote-Mosaic compile failures for the fused level-0 kernels: the
tunnel compile helper returns an opaque HTTP 500, so this compiles each
kernel PIECE and each (shape, block) point separately on the real toolchain
and reports pass/fail. Host-side lowering already passes for all of these
(tests/test_fused_level0.py::test_kernels_lower_for_tpu) — this finds what
the backend itself rejects.

Usage: python scripts/tpu_mosaic_probe.py
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())

    def probe(name, fn, *args):
        try:
            out = fn(*args)
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in (out if isinstance(out, tuple) else (out,)))
            float(s)
            log(f"  {name}: COMPILES+RUNS")
            return True
        except Exception as e:
            log(f"  {name}: FAIL {type(e).__name__}: {str(e)[:100]}")
            return False

    # -- pieces (standalone mini pallas_calls at block shape) ---------------
    bh, bw, c = 8, 512, 64

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

    # 1. conv1 broadcast-FMA
    def k_conv1(x_ref, w_ref, o_ref):
        acc = jnp.zeros((bh + 2, bw + 2, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[dy:dy + bh + 2, dx:dx + bw + 2]
                acc = acc + xs[:, :, None] * w_ref[3 * dy + dx][None, None, :]
        o_ref[...] = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)

    probe("conv1-bcast", lambda: call(
        k_conv1,
        (jnp.ones((bh + 4, bw + 4), jnp.float32), jnp.ones((9, c), jnp.float32)),
        jax.ShapeDtypeStruct((bh + 2, bw + 2, c), jnp.bfloat16)))

    # 2. pair-dot conv2 from a VMEM ref
    def k_pair(h_ref, w_ref, o_ref):
        acc = None
        for p in range(5):
            ta, tb = 2 * p, 2 * p + 1
            ya, xa = ta // 3, ta % 3
            if tb < 9:
                yb, xb = tb // 3, tb % 3
                lhs = jnp.concatenate(
                    [h_ref[ya:ya + bh, xa:xa + bw, :],
                     h_ref[yb:yb + bh, xb:xb + bw, :]], axis=-1)
            else:
                lhs = jnp.concatenate(
                    [h_ref[ya:ya + bh, xa:xa + bw, :],
                     jnp.zeros((bh, bw, c), jnp.bfloat16)], axis=-1)
            d = lax.dot_general(lhs, w_ref[p],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[...] = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)

    probe("pair-dot", lambda: call(
        k_pair,
        (jnp.ones((bh + 2, bw + 2, c), jnp.bfloat16),
         jnp.ones((5, 2 * c, c), jnp.bfloat16)),
        jax.ShapeDtypeStruct((bh, bw, c), jnp.bfloat16)))

    # 3. strided-ref pool
    def k_pool(h_ref, o_ref):
        o_ref[...] = jnp.maximum(
            jnp.maximum(h_ref[0::2, 0::2, :], h_ref[0::2, 1::2, :]),
            jnp.maximum(h_ref[1::2, 0::2, :], h_ref[1::2, 1::2, :]))

    probe("pool-strided-ref", lambda: call(
        k_pool, (jnp.ones((bh, bw, c), jnp.bfloat16),),
        jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16)))

    # 4. int8 quantize store
    def k_q8(h_ref, o_ref):
        o_ref[...] = jnp.clip(jnp.round(h_ref[...].astype(jnp.float32) * 50.0),
                              0.0, 127.0).astype(jnp.int8)

    probe("int8-store", lambda: call(
        k_q8, (jnp.ones((bh, bw, c), jnp.bfloat16),),
        jax.ShapeDtypeStruct((bh, bw, c), jnp.int8)))

    # 5. multi-output + scratch (the enc0 structure, trivial math)
    def k_multi(x_ref, skip_ref, pool_ref, h2_ref):
        h2_ref[...] = (x_ref[0:bh, 0:bw][:, :, None]
                       * jnp.ones((1, 1, c), jnp.float32)).astype(jnp.bfloat16)
        skip_ref[...] = h2_ref[...]
        pool_ref[...] = jnp.maximum(
            jnp.maximum(h2_ref[0::2, 0::2, :], h2_ref[0::2, 1::2, :]),
            jnp.maximum(h2_ref[1::2, 0::2, :], h2_ref[1::2, 1::2, :]))

    probe("multi-out+scratch", lambda: call(
        k_multi, (jnp.ones((bh + 4, bw + 4), jnp.float32),),
        (jax.ShapeDtypeStruct((bh, bw, c), jnp.bfloat16),
         jax.ShapeDtypeStruct((bh // 2, bw // 2, c), jnp.bfloat16)),
        scratch=[pltpu.VMEM((bh, bw, c), jnp.bfloat16)]))

    # -- whole kernels at growing sizes --------------------------------------
    from tpu_unet.ops.fused_level0 import concat_quantize, enc0_chain

    w1 = jnp.ones((3, 3, 1, c), jnp.float32) * 0.1
    b1 = jnp.zeros((c,))
    w2 = jnp.ones((3, 3, c, c), jnp.float32) * 0.01
    b2 = jnp.zeros((c,))
    for (bsz, n, bc) in ((1, 68, 64), (1, 260, 256), (1, 1372, 512),
                         (8, 1372, 512)):
        probe(f"enc0_chain {bsz}x{n} bc={bc}",
              lambda _b=bsz, _n=n, _bc=bc: enc0_chain(
                  jnp.ones((_b, _n, _n, 1), jnp.float32), w1, b1, w2, b2,
                  block_rows=8, block_cols=_bc))

    for (bsz, m, br) in ((1, 72, 8), (1, 328, 8), (8, 1192, 8), (8, 1192, 16)):
        a = jnp.ones((bsz, m, m, c), jnp.bfloat16)
        probe(f"concat_quantize {bsz}x{m} br={br}",
              lambda _a=a, _br=br: concat_quantize(_a, _a, 0.02,
                                                   block_rows=_br))


if __name__ == "__main__":
    main()
