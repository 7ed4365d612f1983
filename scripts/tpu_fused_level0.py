"""Shootout: fused level-0 chain kernels vs the XLA composition, at the
production int8 serving geometry (VERDICT r2 item 2).

Measures, with adaptive-reps readback timing:
  A. enc0 chain (conv1 1->64 + ReLU + conv2 64->64 + ReLU + 2x2 pool):
     XLA composed vs ops/fused_level0.enc0_chain (block_rows sweep).
  B. dec0 concat+requantize: XLA (quantize + concatenate) vs
     ops/fused_level0.concat_quantize.

Usage: python scripts/tpu_fused_level0.py [--cpu] [--batch 8] [--size 1372]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=1372,
                    help="enc0 input size (1372 = the 1188-out serving tile)")
    ap.add_argument("--block-rows", default="8,16")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tpu_unet.ops.fused_level0 import concat_quantize, enc0_chain
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    b, n = args.batch, args.size
    c = 64
    key = jax.random.PRNGKey(0)
    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    x = jax.random.uniform(key, (b, n, n, 1), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 1, c),
                           jnp.float32) * 0.5
    b1 = jnp.zeros((c,), jnp.float32)
    w2 = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, c, c),
                           jnp.float32) * 0.2
    b2 = jnp.zeros((c,), jnp.float32)

    # -- A: enc0 chain ------------------------------------------------------
    def xla_chain(x):
        def conv(v, w, bias):
            dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                v.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
                "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return jnp.maximum(y + bias, 0.0).astype(jnp.bfloat16)

        h1 = conv(x, w1, b1)
        h2 = conv(h1, w2, b2)
        pooled = jax.lax.reduce_window(h2, jnp.asarray(-jnp.inf, h2.dtype),
                                       jax.lax.max, (1, 2, 2, 1),
                                       (1, 2, 2, 1), "VALID")
        return h2, pooled

    def run(label, fn, *a):
        # every fn returns a scalar reduction over its real outputs
        try:
            t = timeit_readback(fn, *a)
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:150]}")
            return None
        px = b * n * n
        log(f"  {label}: {t*1e3:.2f} ms  ({px / t / 1e9:.1f} Gpx/s)")
        return t

    log(f"enc0 chain at [{b}, {n}, {n}, 1] -> skip + pooled")
    # sum both outputs so neither is dead
    t_xla = run("xla composed ", lambda v: sum(
        jnp.sum(o.astype(jnp.float32)) for o in xla_chain(v)), x)

    # correctness spot-check of the first compiling config before timing
    def check(label, **kw):
        try:
            sk_f, pl_f = enc0_chain(x[:1, :188, :188], w1, b1, w2, b2, **kw)
            sk_o, pl_o = xla_chain(x[:1, :188, :188])
            e1 = float(jnp.max(jnp.abs(sk_f.astype(jnp.float32)
                                       - sk_o.astype(jnp.float32))))
            e2 = float(jnp.max(jnp.abs(pl_f.astype(jnp.float32)
                                       - pl_o.astype(jnp.float32))))
            log(f"  {label}: skip|err|={e1:.2e} pool|err|={e2:.2e}")
            return True
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return False

    compiling = []
    for pm in ("fused", "cols", "none"):
        if check(f"spot-check pool_mode={pm}", pool_mode=pm):
            compiling.append(pm)
    # time the best in-kernel mode plus the first fallback tier below it
    sweep = compiling[:2] if compiling and compiling[0] == "fused" \
        else compiling
    for pm in sweep:
        for br in map(int, args.block_rows.split(",")):
            for bc in (128, 256, 512):
                ok = run(f"fused pm={pm} br={br} bc={bc}",
                         lambda v, _pm=pm, _br=br, _bc=bc: sum(
                             jnp.sum(o.astype(jnp.float32))
                             for o in enc0_chain(v, w1, b1, w2, b2,
                                                 block_rows=_br,
                                                 block_cols=_bc,
                                                 pool_mode=_pm)), x)
                if ok is not None:
                    run(f"fused+q8 pm={pm} br={br} bc={bc}",
                        lambda v, _pm=pm, _br=br, _bc=bc: sum(
                            jnp.sum(o.astype(jnp.float32))
                            for o in enc0_chain(v, w1, b1, w2, b2,
                                                block_rows=_br,
                                                block_cols=_bc,
                                                pool_mode=_pm,
                                                skip_scale=0.02)), x)

    # -- B: dec0 concat+quantize --------------------------------------------
    m = n - 180  # dec0 resolution for this tile (1372 -> 1192)
    sk = (jax.random.uniform(jax.random.fold_in(key, 3), (b, m, m, c)) * 2
          ).astype(jnp.int8)
    u = (jax.random.uniform(jax.random.fold_in(key, 4), (b, m, m, c)) * 2
         ).astype(jnp.bfloat16)
    s_cat = 0.02

    def xla_cat(sk, u):
        uq = jnp.clip(jnp.round(u.astype(jnp.float32) / s_cat),
                      -127.0, 127.0).astype(jnp.int8)
        return jnp.concatenate([sk, uq], axis=-1)

    log(f"dec0 concat+quantize at [{b}, {m}, {m}, {c}]x2 -> int8 [.., 128]")
    run("xla cat+quant", lambda a_, b_: jnp.sum(
        xla_cat(a_, b_).astype(jnp.float32)), sk, u)
    # block VMEM = 2*br*W*C*2B in + br*W*2C out, double-buffered: br >= 64
    # overruns VMEM at serving widths (first-shootout compile failures)
    for br in (4, 8, 16):
        run(f"fused cat br={br}", lambda a_, b_, _br=br: jnp.sum(
            concat_quantize(a_, b_, s_cat, block_rows=_br).astype(
                jnp.float32)), sk, u)


if __name__ == "__main__":
    main()
