"""Round-4 proven-atom Pallas retry on the DEEP serving convs (VERDICT r3
item 2 / weak #1).

The round-2 per-layer shootout that rejected Pallas at every serving shape
predates the mosaic_probe3 lessons (2D-reshaped dots, rows3/im2col VMEM
staging compile well on this remote Mosaic toolchain) and used the
superseded 16x1188 workload shapes. This script closes the evidentiary gap:
it A/Bs the XLA int8 emitters against the proven-atom Pallas formulations at
the EXACT shapes of the current headline workload (phase-int8, batch 16,
1348-out tiles; stage profile results/r3/int4_attrib.txt):

  enc1_conv2   3x3 int8 128->128 @ 762^2   (+22.4 ms/fwd, the biggest 3x3)
  dec1_conv1   3x3 int8 256->128 @ 678^2   (+18.2 ms/fwd)
  dec0_conv1   2x2 int8 256->256 @ 676^2   (packed split-conv halves — the
                                            costliest stage, +29.5 ms; NEVER
                                            probed in Pallas before)
  dec0_conv2   2x2 int8 256->256 @ 675^2

3x3 candidates reuse ops/conv_tiles.conv3x3_fused's nconcat/rows3/im2col
variants (the rows3/im2col staging is exactly the proven-atom pattern). The
2x2 packed candidates are built here from the same atoms: scratch-buffered
im2col + one 2D-reshaped dot.

All timings via timeit_readback (adaptive reps — short probes are
roundtrip-noise-dominated). Usage:
  python scripts/tpu_deep_shootout_r4.py [--batch 16]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--section", type=int, default=0,
                    help="1..4 = run one shape only (fresh process per "
                         "section: failed Pallas attempts leak device "
                         "buffers on the axon backend and OOM later "
                         "sections — observed run 1); 0 = all")
    ap.add_argument("--only", default="",
                    help="substring filter on variant names (incl. "
                         "'xla-int8'); lets a fresh process rerun ONE "
                         "variant uncontaminated by leaked buffers from "
                         "earlier failed attempts")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_unet.ops.conv_tiles import conv3x3_fused, conv3x3_int8_xla
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    B = args.batch
    key = jax.random.PRNGKey(0)

    # ---- Pallas 2x2 conv from the proven atoms ------------------------------
    # im2col4: scratch [br, wo, 4*cin] (dy,dx in {0,1}), ONE K=4*cin 2D dot.
    # rows2:   per-dy scratch [br, wo, 2*cin], two K=2*cin dots.
    def _k2(slab_ref, w_ref, a_ref, b_ref, o_ref, buf_ref, *, br, wo,
            variant):
        cin = slab_ref.shape[-1]
        tc = o_ref.shape[-1]
        if variant == "im2col4":
            for dy in range(2):
                for dx in range(2):
                    t = (dy * 2 + dx) * cin
                    buf_ref[:, :, t:t + cin] = (
                        slab_ref[0, 0, dy:dy + br, dx:dx + wo, :])
            acc = lax.dot_general(
                buf_ref[...].reshape(br * wo, 4 * cin),
                w_ref[...].reshape(4 * cin, tc),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(br, wo, tc)
        else:  # rows2
            acc = None
            for dy in range(2):
                for dx in range(2):
                    buf_ref[:, :, dx * cin:(dx + 1) * cin] = (
                        slab_ref[0, 0, dy:dy + br, dx:dx + wo, :])
                d = lax.dot_general(
                    buf_ref[...].reshape(br * wo, 2 * cin),
                    w_ref[dy].reshape(2 * cin, tc),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            acc = acc.reshape(br, wo, tc)
        y = jnp.maximum(
            acc.astype(jnp.float32) * a_ref[0][None, None, :]
            + b_ref[0][None, None, :], 0.0)
        o_ref[0] = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    def conv2x2_fused(x, w, alpha, beta, *, block_rows=8, cout_tile=256,
                      variant="im2col4"):
        bsz, h, wd, cin = x.shape
        cout = w.shape[-1]
        ho, wo = h - 1, wd - 1
        pad_rows = (-ho) % block_rows
        if pad_rows:
            x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
            ho += pad_rows
        n_r = ho // block_rows
        starts = jnp.arange(n_r) * block_rows
        slabs = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(x, s, block_rows + 1, axis=1),
            out_axes=1)(starts)                    # [B, R, br+1, W, cin]
        nbuf = 4 if variant == "im2col4" else 2
        out = pl.pallas_call(
            functools.partial(_k2, br=block_rows, wo=wo, variant=variant),
            grid=(cout // cout_tile, bsz, n_r),
            in_specs=[
                pl.BlockSpec((1, 1, block_rows + 1, wd, cin),
                             lambda c, b_, r: (b_, r, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 2, cin, cout_tile),
                             lambda c, b_, r: (0, 0, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout_tile), lambda c, b_, r: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout_tile), lambda c, b_, r: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_rows, wo, cout_tile),
                                   lambda c, b_, r: (b_, r, 0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, cout), jnp.int8),
            scratch_shapes=[pltpu.VMEM((block_rows, wo, nbuf * cin),
                                       jnp.int8)],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * ho * wo * 4 * cin * cout,
                bytes_accessed=(slabs.size + w.size
                                + bsz * ho * wo * cout),
                transcendentals=0),
        )(slabs, w, alpha.reshape(1, cout).astype(jnp.float32),
          beta.reshape(1, cout).astype(jnp.float32))
        if pad_rows:
            out = out[:, :ho - pad_rows]
        return out

    # ---- column-tiled rows3 (2D spatial grid) ------------------------------
    # Run 1 showed Mosaic's compile helper crashes (HTTP 500) on every
    # full-width block at 678-762 cols — blocks the r2-era shapes never
    # reached. This variant gives Mosaic the SAME proven rows3 atom on a
    # (block_rows x block_cols) tile: both spatial dims pre-gathered into
    # overlapping slabs, output written block-at-offset.
    def _k3col(slab_ref, w_ref, a_ref, b_ref, o_ref, buf_ref, *, br, wc, kh):
        cin = slab_ref.shape[-1]
        tc = o_ref.shape[-1]
        acc = None
        for dy in range(kh):
            for dx in range(kh):
                buf_ref[:, :, dx * cin:(dx + 1) * cin] = (
                    slab_ref[0, 0, 0, dy:dy + br, dx:dx + wc, :])
            d = lax.dot_general(
                buf_ref[...].reshape(br * wc, kh * cin),
                w_ref[dy].reshape(kh * cin, tc),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        acc = acc.reshape(br, wc, tc)
        y = jnp.maximum(
            acc.astype(jnp.float32) * a_ref[0][None, None, :]
            + b_ref[0][None, None, :], 0.0)
        o_ref[0] = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    def conv_rows3_col(x, w, alpha, beta, *, block_rows=8, block_cols=256,
                       cout_tile=None):
        kh = w.shape[0]
        bsz, h, wd, cin = x.shape
        cout = w.shape[-1]
        ho, wo = h - (kh - 1), wd - (kh - 1)
        cout_tile = cout_tile or min(cout, 256)
        pr, pc = (-ho) % block_rows, (-wo) % block_cols
        if pr or pc:
            x = jnp.pad(x, ((0, 0), (0, pr), (0, pc), (0, 0)))
            ho += pr
            wo += pc
        n_r, n_c = ho // block_rows, wo // block_cols
        rs = jnp.arange(n_r) * block_rows
        cs = jnp.arange(n_c) * block_cols
        slabs = jax.vmap(
            lambda r: jax.vmap(
                lambda c: lax.dynamic_slice(
                    x, (0, r, c, 0),
                    (bsz, block_rows + kh - 1, block_cols + kh - 1, cin)),
                out_axes=1)(cs),
            out_axes=1)(rs)      # [B? no: vmap out_axes] -> see below
        # slabs: outer vmap over rows (out_axes=1), inner over cols
        # (out_axes=1 of the inner result [B, br+k, wc+k, cin]) ->
        # [B, R, C, br+k, wc+k, cin]
        out = pl.pallas_call(
            functools.partial(_k3col, br=block_rows, wc=block_cols, kh=kh),
            grid=(cout // cout_tile, bsz, n_r, n_c),
            in_specs=[
                pl.BlockSpec((1, 1, 1, block_rows + kh - 1,
                              block_cols + kh - 1, cin),
                             lambda co, b_, r, c: (b_, r, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kh, kh, cin, cout_tile),
                             lambda co, b_, r, c: (0, 0, 0, co),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout_tile), lambda co, b_, r, c: (0, co),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout_tile), lambda co, b_, r, c: (0, co),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_rows, block_cols, cout_tile),
                                   lambda co, b_, r, c: (b_, r, c, co),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, ho, wo, cout), jnp.int8),
            scratch_shapes=[pltpu.VMEM((block_rows, block_cols, kh * cin),
                                       jnp.int8)],
            cost_estimate=pl.CostEstimate(
                flops=2 * bsz * ho * wo * kh * kh * cin * cout,
                bytes_accessed=(slabs.size + w.size
                                + bsz * ho * wo * cout),
                transcendentals=0),
        )(slabs, w, alpha.reshape(1, cout).astype(jnp.float32),
          beta.reshape(1, cout).astype(jnp.float32))
        if pr or pc:
            out = out[:, :ho - pr, :wo - pc]
        return out

    def xla2x2(x, w, alpha, beta):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * alpha + beta, 0.0)
        return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)

    def mk_data(h, cin, cout, kh):
        k1, k2 = jax.random.split(jax.random.fold_in(key, h * cin), 2)
        x = jax.random.randint(k1, (B, h, h, cin), -127, 128, jnp.int8)
        w = jax.random.randint(k2, (kh, kh, cin, cout), -127, 128, jnp.int8)
        alpha = jnp.full((cout,), 1e-4, jnp.float32)
        beta = jnp.zeros((cout,), jnp.float32)
        return x, w, alpha, beta

    def tput(name, fn, x, w, alpha, beta, kh, checked_vs=None):
        """Time fn; report T/s (2*k^2*cin*cout per output px)."""
        if args.only and not any(s and s in name
                                 for s in args.only.split(",")):
            return None
        for attempt in (1, 2):
            try:
                jf = jax.jit(fn)
                out = jf(x, w, alpha, beta)
                if checked_vs is not None:
                    ref = checked_vs(x, w, alpha, beta)
                    mism = float(jnp.mean(
                        (out.astype(jnp.int32)
                         - ref.astype(jnp.int32) != 0).astype(jnp.float32)))
                else:
                    mism = None
                dt = timeit_readback(jf, x, w, alpha, beta)
                ho = x.shape[1] - (kh - 1)
                wo = x.shape[2] - (kh - 1)
                fl = 2 * B * ho * wo * kh * kh * x.shape[-1] * w.shape[-1]
                log(f"  {name:26s}: {dt*1e3:8.2f} ms  {fl/dt/1e12:7.1f} T/s"
                    + (f"  mismatch={mism:.2e}" if mism is not None else ""))
                return dt
            except Exception as e:
                log(f"  {name:26s}: attempt {attempt} FAIL "
                    f"{type(e).__name__}: {str(e)[:120]}")
        return None

    xla = functools.partial(conv3x3_int8_xla, out_kind="int8")

    def want(s):
        return args.section in (0, s)

    # ---- 1. enc1_conv2: 3x3 128->128 @ 762^2 --------------------------------
    if want(1):
        log(f"== enc1_conv2  3x3 128->128 @ 762^2  batch {B} ==")
        x, w, a, b = mk_data(762, 128, 128, 3)
        tput("xla-int8", xla, x, w, a, b, 3)
        for var, br in (("nconcat", 8), ("rows3", 8), ("im2col", 8)):
            tput(f"pallas-{var}-br{br}",
                 functools.partial(conv3x3_fused, out_kind="int8",
                                   block_rows=br, cout_tile=128, variant=var),
                 x, w, a, b, 3, checked_vs=jax.jit(xla))
        for br, wc in ((8, 256), (16, 128), (8, 128)):
            tput(f"pallas-rows3col-{br}x{wc}",
                 functools.partial(conv_rows3_col, block_rows=br,
                                   block_cols=wc, cout_tile=128),
                 x, w, a, b, 3, checked_vs=jax.jit(xla))
        del x

    # ---- 2. dec1_conv1: 3x3 256->128 @ 678^2 --------------------------------
    if want(2):
        log(f"== dec1_conv1  3x3 256->128 @ 678^2  batch {B} ==")
        x, w, a, b = mk_data(678, 256, 128, 3)
        tput("xla-int8", xla, x, w, a, b, 3)
        tput("pallas-nconcat-br16",
             functools.partial(conv3x3_fused, out_kind="int8",
                               block_rows=16, cout_tile=128,
                               variant="nconcat"),
             x, w, a, b, 3, checked_vs=jax.jit(xla))
        for br, wc in ((8, 256), (16, 128)):
            tput(f"pallas-rows3col-{br}x{wc}",
                 functools.partial(conv_rows3_col, block_rows=br,
                                   block_cols=wc, cout_tile=128),
                 x, w, a, b, 3, checked_vs=jax.jit(xla))
        del x

    # ---- 3. dec0_conv1 packed half: 2x2 256->256 @ 676^2 --------------------
    if want(3):
        log(f"== dec0_conv1 packed  2x2 256->256 @ 676^2  batch {B} ==")
        x, w, a, b = mk_data(676, 256, 256, 2)
        tput("xla-int8", xla2x2, x, w, a, b, 2)
        for var, br in (("im2col4", 8), ("rows2", 8)):
            tput(f"pallas-{var}-br{br}",
                 functools.partial(conv2x2_fused, block_rows=br, variant=var),
                 x, w, a, b, 2, checked_vs=jax.jit(xla2x2))
        for br, wc in ((8, 256), (16, 128)):
            tput(f"pallas-rows2col-{br}x{wc}",
                 functools.partial(conv_rows3_col, block_rows=br,
                                   block_cols=wc, cout_tile=256),
                 x, w, a, b, 2, checked_vs=jax.jit(xla2x2))
        del x

    # ---- 4. dec0_conv2 packed: 2x2 256->256 @ 675^2 -------------------------
    if want(4):
        log(f"== dec0_conv2 packed  2x2 256->256 @ 675^2  batch {B} ==")
        x, w, a, b = mk_data(675, 256, 256, 2)
        tput("xla-int8", xla2x2, x, w, a, b, 2)
        for br, wc in ((8, 256),):
            tput(f"pallas-rows2col-{br}x{wc}",
                 functools.partial(conv_rows3_col, block_rows=br,
                                   block_cols=wc, cout_tile=256),
                 x, w, a, b, 2, checked_vs=jax.jit(xla2x2))
    log("done")


if __name__ == "__main__":
    main()
