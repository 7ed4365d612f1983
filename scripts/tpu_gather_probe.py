"""Augmentation-gather probe (VERDICT r2 item 3a / STATUS r3 queue #2).

The fused warp costs ~15 ms per 572^2 bilinear sample (4 jnp.take gathers of
a [H*W, 2] flat source). This probes every candidate mechanism on the real
toolchain before any kernel work:

1. XLA take minor-dim sensitivity: the same 327K-point gather against flat
   sources with 2 / 8 / 128 lanes — is the cost per point or per tile-row?
2. XLA row-gather (take whole rows, then in-row arithmetic): rotation
   coordinates per output row span a diagonal band, but a 2-pass
   rows-then-columns decomposition would do 2 rectangular gathers of
   width-W rows instead of 4 point gathers.
3. Pallas per-element gather: jnp.take / vector indexing inside a kernel —
   does Mosaic accept it at all (the STATUS queue's "blocker to check
   first")?
4. Pallas scalar dynamic-slice row loop: fori_loop of pl.ds(row_i, 1) reads
   — the fallback gather mechanism; measures its rate.

Usage: python scripts/tpu_gather_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def _round_up(x, m):
    return -(-x // m) * m


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    S = 572                      # warp canvas
    n_pts = S * S
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n_pts,), 0, S * S - S - 2)

    def t(label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  {label}: {d*1e3:.3f} ms")
            return d
        except Exception as e:
            log(f"  {label}: FAIL {type(e).__name__}: {str(e)[:110]}")
            return None

    # -- 1. minor-dim sensitivity ------------------------------------------
    log(f"1. jnp.take of {n_pts} points, flat [H*W, C] source:")
    for c in (2, 8, 128):
        src = jnp.ones((S * S, c), jnp.float32)
        f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        t(f"take C={c:3d}", f, src, idx)
    # 4-tap bilinear composite (the real workload shape, C=2)
    src2 = jnp.ones((S * S, 2), jnp.float32)

    def bilin(s, i):
        v00 = jnp.take(s, i, axis=0)
        v01 = jnp.take(s, i + 1, axis=0)
        v10 = jnp.take(s, i + S, axis=0)
        v11 = jnp.take(s, i + S + 1, axis=0)
        return v00 * 0.25 + v01 * 0.25 + v10 * 0.25 + v11 * 0.25

    t("bilinear 4-tap C=2 (workload)", jax.jit(bilin), src2, idx)

    # 1b. pre-shifted-neighborhood stack: ONE take of [H*W, 4C] replaces the
    # four point gathers (take cost measured per-point, channel-insensitive
    # to >=8 lanes above). Bit-identical arithmetic to the 4-tap composite.
    def bilin_stacked(s, i):
        nb = jnp.concatenate(
            [s, jnp.roll(s, -1, axis=0), jnp.roll(s, -S, axis=0),
             jnp.roll(s, -(S + 1), axis=0)], axis=1)         # [H*W, 8]
        g = jnp.take(nb, i, axis=0)
        return (g[:, 0:2] * 0.25 + g[:, 2:4] * 0.25
                + g[:, 4:6] * 0.25 + g[:, 6:8] * 0.25)

    t("bilinear stacked 1-take C=2", jax.jit(bilin_stacked), src2, idx)

    # -- 2. row gather ------------------------------------------------------
    log("2. whole-row gathers [S rows of W] (2-pass decomposition bound):")
    img = jnp.ones((S, S), jnp.float32)
    ridx = jax.random.randint(key, (S,), 0, S - 1)
    t("take S rows", jax.jit(lambda s, i: jnp.take(s, i, axis=0)), img, ridx)
    ridx2 = jax.random.randint(key, (2 * S,), 0, S - 1)
    t("take 2S rows", jax.jit(lambda s, i: jnp.take(s, i, axis=0)), img, ridx2)

    # -- 3. Pallas in-kernel gather ----------------------------------------
    log("3. Pallas in-kernel gather (Mosaic support):")
    srcp = jnp.ones((S * S, 128), jnp.float32)
    n_pad = _round_up(n_pts, 128)
    idx2d = jnp.pad(idx, (0, n_pad - n_pts)).reshape(-1, 128) % (S * S)

    def k_take(s_ref, i_ref, o_ref):
        # gather 128 rows (one index sublane) via jnp.take inside the kernel
        o_ref[...] = jnp.take(s_ref[...], i_ref[0], axis=0)

    def run_take():
        return pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(srcp[:4096], idx2d[:1] % 4096)

    t("in-kernel jnp.take (4096x128 src, 128 idx)", run_take)

    def k_vecidx(s_ref, i_ref, o_ref):
        o_ref[...] = s_ref[i_ref[0], :]

    def run_vecidx():
        return pl.pallas_call(
            k_vecidx,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(srcp[:4096], idx2d[:1] % 4096)

    t("in-kernel vector ref index", run_vecidx)

    # -- 4. Pallas scalar dynamic-slice row loop ----------------------------
    log("4. Pallas scalar-rate row loop (pl.ds fallback):")

    def k_rowloop(i_ref, s_ref, o_ref):
        def body(n, _):
            o_ref[pl.ds(n, 1), :] = s_ref[pl.ds(i_ref[n], 1), :]
            return 0
        lax.fori_loop(0, o_ref.shape[0], body, 0)

    def run_rowloop(nrows):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            k_rowloop,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
        )(idx2d[0][:nrows] % 4096, srcp[:4096])

    for nrows in (128, 1024):
        t(f"scalar row loop n={nrows}",
          functools.partial(run_rowloop, nrows))

    # -- 5. the actual pipeline warp for scale ------------------------------
    log("5. reference point: the fused warp itself:")
    from tpu_unet.data.augment import _fused_rotate_elastic_multi
    from tpu_unet.ops.warp import elastic_fields

    src = jnp.ones((388, 388, 2), jnp.float32)
    dx, dy = elastic_fields(jax.random.PRNGKey(1), (S, S), 200.0, 10.0)

    for mode in ("take4", "stacked"):
        f = jax.jit(lambda s, a, dx_, dy_, _m=mode: _fused_rotate_elastic_multi(
            s, a, dx_, dy_, S, order=1, gather=_m))
        t(f"fused warp 572^2 (1 sample, 2ch, {mode})", f, src,
          jnp.float32(30.0), dx, dy)


if __name__ == "__main__":
    main()
