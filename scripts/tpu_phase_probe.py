"""Round-3 TPU probe: phase-packed (space-to-depth) level-0 serving ops.

Level 0 is 55% of the serving forward and runs at 2.7-94 T/s because its
1-64 channels waste the 128-lane MXU (results/r2/stage_profile.txt). The
phase formulation (ops/phase.py) relabels 2x2 pixel blocks into channels:
3x3 stride-1 valid convs become 2x2 convs at 4x channels (256 — full lanes,
and inside the int8-profitable cin>=128 regime) for 16/9 = 1.78x the FLOPs;
pool0 collapses to a channel max; up0 to one matmul; the decoder concat is
eliminated by kernel splitting. This probe measures every atom and the
composed chains against the production ops, same session, chained-reps
timing (tpu_quant_probe.timeit).

Usage: python scripts/tpu_phase_probe.py [--batch 8] [--tile 1372]
       [section ...]   sections: atoms enc dec lvl1  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import tpu_quant_probe as qp
from tpu_quant_probe import log


def ri8(key, shape, lim=7):
    return jax.random.randint(jax.random.PRNGKey(key), shape, -lim, lim + 1,
                              jnp.int32).astype(jnp.int8)


def rbf(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.bfloat16)


def conv3(x, w, preferred=None):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    preferred_element_type=preferred)


def epilogue_i8(acc, alpha, beta):
    y = jnp.maximum(acc.astype(jnp.float32) * alpha + beta, 0.0)
    return jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)


def tflops(dt, flops):
    return flops / dt / 1e12


def gf(b, s_out, kk, cin, cout):
    return 2.0 * kk * cin * cout * b * s_out * s_out



def timed(label, fn, *args, chain_arg=None, flops=None):
    """timeit with per-entry failure isolation (remote compiles can 500)
    and adaptive reps: cheap atoms (s2d, phase_pool) re-measure with enough
    chained reps that the device work dominates the ~30 ms tunnel roundtrip
    (the CLAUDE.md short-probe rule)."""
    try:
        f = jax.jit(fn)
        dt = qp.timeit(f, *args, chain_arg=chain_arg)
        if dt * 8 < 3 * (qp.ROUNDTRIP or 0):
            reps = min(512, int(3 * qp.ROUNDTRIP / max(dt, 1e-6)) + 8)
            dt = qp.timeit(f, *args, chain_arg=chain_arg, reps=reps)
        extra = f" {tflops(dt, flops):6.1f} T/s" if flops else ""
        log(f"  {label} {dt*1e3:7.2f} ms{extra}")
        return dt
    except Exception as e:
        log(f"  {label} FAIL {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    args = sys.argv[1:]
    batch, tile = 8, 1372
    if "--batch" in args:
        batch = int(args[args.index("--batch") + 1])
    if "--tile" in args:
        tile = int(args[args.index("--tile") + 1])
    sections = [a for a in args if not a.startswith("--")
                and not a.isdigit()] or ["atoms", "enc", "dec", "lvl1"]

    from tpu_unet.ops.phase import (conv2x2_valid, depth_to_space, phase_pool,
                                    space_to_depth)

    log(f"device: {jax.devices()[0]}")
    qp.measure_roundtrip()

    b = batch
    s = tile                      # 1372
    s1 = s - 2                    # 1370 (conv1 out)
    s2 = s - 4                    # 1368 (conv2 out / skip)
    sd = s // 2                   # 686 packed input
    sd1 = sd - 1                  # 685
    sd2 = sd - 2                  # 684
    # decoder geometry: tile_out = tile-184 (1188 at 1372); dec1 output
    # su^2 x128 -> up0 (2*su)^2 x64; skip 1368^2 crops by mg=88 per side.
    out = tile - 184
    assert out > 0, "tile too small for the 5-level geometry"
    su = (out + 4) // 2           # 596 at 1372
    mg = (s2 - 2 * su) // 2       # 88 at 1372 (even; phase crop = mg//2)
    assert mg % 2 == 0
    alpha = jnp.ones((256,), jnp.float32) * 1e-3
    alpha64 = jnp.ones((64,), jnp.float32) * 1e-3
    beta = jnp.zeros((256,), jnp.float32)
    beta64 = jnp.zeros((64,), jnp.float32)

    if "atoms" in sections:
        log(f"== atoms, b{b} x {tile}-in ==")
        # raw 2x2 conv rates at the packed shapes (the MXU question)
        for nm, ss, ci, co in (("2x2 conv 256->256 @685", sd1 + 1, 256, 256),
                               ("2x2 conv 256->256 @595", su, 256, 256)):
            f = gf(b, ss - 1, 4, ci, co)
            x8 = ri8(1, (b, ss, ss, ci))
            w8 = ri8(2, (2, 2, ci, co))
            timed(f"{nm} int8 raw ",
                  lambda x, w: conv2x2_valid(x, w, jnp.int32), x8, w8,
                  flops=f)
            timed(f"{nm} int8+epi ",
                  lambda x, w, a, be: epilogue_i8(
                      conv2x2_valid(x, w, jnp.int32), a, be),
                  x8, w8, alpha, beta, chain_arg=2, flops=f)
            xb = rbf(3, (b, ss, ss, ci))
            wb = rbf(4, (2, 2, ci, co))
            timed(f"{nm} bf16     ",
                  lambda x, w: conv2x2_valid(
                      x, w, jnp.float32).astype(jnp.bfloat16), xb, wb,
                  flops=f)
            del x8, w8, xb, wb

        # s2d of the raw input tile
        xin = rbf(5, (b, s, s, 1))
        timed(f"s2d input [b,{s},{s},1] bf16    ", space_to_depth, xin,
              chain_arg=0)
        del xin

        # phase pool vs reduce_window pool, bf16 and int8
        for nm, mk in (("bf16", rbf), ("int8", ri8)):
            xp = mk(6, (b, sd2, sd2, 256))
            timed(f"phase_pool [{sd2}^2,256] {nm}    ", phase_pool, xp,
                  chain_arg=0)
            del xp
            xf = mk(7, (b, s2, s2, 64))
            init = -np.inf if nm == "bf16" else np.int8(-128)
            timed(f"reduce_window pool [{s2}^2,64] {nm}",
                  lambda t: lax.reduce_window(
                      t, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"),
                  xf, chain_arg=0)
            del xf

        # up0: conv_transpose vs packed matmul (bf16, production dtype)
        xd = rbf(8, (b, su, su, 128))
        kt = rbf(9, (2, 2, 128, 64))
        timed(f"up0 conv_transpose [{su}^2,128->64]",
              lambda x, k: lax.conv_transpose(
                  x, k, (2, 2), "VALID",
                  dimension_numbers=("NHWC", "HWIO", "NHWC"),
                  preferred_element_type=jnp.float32).astype(jnp.bfloat16),
              xd, kt)
        km = rbf(10, (128, 256))
        bm = jnp.zeros((256,), jnp.float32)
        timed(f"up0 packed matmul  [{su}^2,128->256p]",
              lambda x, k, bb: (lax.dot_general(
                  x, k, (((3,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32) + bb
                  ).astype(jnp.bfloat16), xd, km, bm, chain_arg=1)
        del xd, kt, km

        # head + final d2s on logits
        xh = rbf(11, (b, (out + 2) // 2, (out + 2) // 2, 256))
        kh = rbf(12, (1, 1, 256, 8))
        timed("packed head 1x1 256->8 + d2s     ",
              lambda x, k: depth_to_space(
                  conv3(x, k, jnp.float32).astype(jnp.bfloat16)), xh, kh)
        del xh, kh

    if "enc" in sections:
        log(f"== enc0 chains, b{b} x {tile}-in ==")
        xin = rbf(20, (b, s, s, 1))
        k1 = rbf(21, (3, 3, 1, 64))
        k2 = rbf(22, (3, 3, 64, 64))
        f_chain = gf(b, s1, 9, 1, 64) + gf(b, s2, 9, 64, 64)

        def enc0_prod(x, ka, kb):
            v = jnp.maximum(conv3(x, ka, jnp.float32), 0.).astype(jnp.bfloat16)
            v = jnp.maximum(conv3(v, kb, jnp.float32), 0.).astype(jnp.bfloat16)
            return lax.reduce_window(v, -jnp.inf, lax.max, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID")

        timed("production bf16 conv+conv+pool   ", enc0_prod, xin, k1, k2,
              chain_arg=1, flops=f_chain)

        p1 = rbf(23, (2, 2, 4, 256))
        p2 = rbf(24, (2, 2, 256, 256))

        def enc0_phase_bf16(x, ka, kb):
            v = space_to_depth(x)
            v = jnp.maximum(conv2x2_valid(v, ka, jnp.float32),
                            0.).astype(jnp.bfloat16)
            v = jnp.maximum(conv2x2_valid(v, kb, jnp.float32),
                            0.).astype(jnp.bfloat16)
            return phase_pool(v)

        timed("phase bf16 s2d+conv+conv+pool    ", enc0_phase_bf16,
              xin, p1, p2, chain_arg=1, flops=f_chain)

        p2q = ri8(25, (2, 2, 256, 256))

        def enc0_phase_mixed(x, ka, kb):
            v = space_to_depth(x)
            v = jnp.maximum(conv2x2_valid(v, ka, jnp.float32), 0.)
            v = jnp.clip(jnp.round(v * 8.0), -127., 127.).astype(jnp.int8)
            v = epilogue_i8(conv2x2_valid(v, kb, jnp.int32), alpha, beta)
            return phase_pool(v)

        timed("phase mixed (conv2 int8) chain   ", enc0_phase_mixed,
              xin, p1, p2q, chain_arg=1, flops=f_chain)
        del xin, k1, k2, p1, p2, p2q

    if "dec" in sections:
        log(f"== dec0 chains, b{b} (596^2 dec1 -> 1188^2 logits) ==")
        xd = rbf(30, (b, su, su, 128))      # dec1 output
        sk8 = ri8(31, (b, s2, s2, 64))      # int8 skip at full res
        kt = rbf(32, (2, 2, 128, 64))
        kc1 = ri8(33, (3, 3, 128, 64))
        kc2 = rbf(34, (3, 3, 64, 64))
        khd = rbf(35, (1, 1, 64, 2))

        def dec0_prod(x, sk, ku, k1, k2, kh):
            u = lax.conv_transpose(
                x, ku, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            skc = sk[:, mg:-mg, mg:-mg, :]
            uq = jnp.clip(jnp.round(u.astype(jnp.float32) * 8.0),
                          -127., 127.).astype(jnp.int8)
            cat = jnp.concatenate([skc, uq], axis=-1)
            v = conv3(cat, k1, jnp.int32)
            v = jnp.maximum(v.astype(jnp.float32) * 1e-3, 0.
                            ).astype(jnp.bfloat16)
            v = jnp.maximum(conv3(v, k2, jnp.float32), 0.).astype(jnp.bfloat16)
            return conv3(v, kh, jnp.float32)

        timed("production up+concat+int8conv+bf16conv+head", dec0_prod,
              xd, sk8, kt, kc1, kc2, khd, chain_arg=2)

        km = rbf(36, (128, 256))
        pk_u = ri8(37, (2, 2, 256, 256))
        pk_s = ri8(38, (2, 2, 256, 256))
        pk2 = ri8(39, (2, 2, 256, 256))
        pkh = rbf(40, (1, 1, 256, 8))
        skp = ri8(41, (b, sd2, sd2, 256))   # packed int8 skip

        def dec0_phase(x, skq, ku, ka, kb, k2, kh):
            u = x @ ku                                  # packed up0
            uq = jnp.clip(jnp.round(u.astype(jnp.float32) * 8.0),
                          -127., 127.).astype(jnp.int8)
            skc = skq[:, mg // 2:-(mg // 2), mg // 2:-(mg // 2), :]
            acc = (conv2x2_valid(uq, ka, jnp.int32)
                   + conv2x2_valid(skc, kb, jnp.int32))
            v = epilogue_i8(acc, alpha, beta)
            v = epilogue_i8(conv2x2_valid(v, k2, jnp.int32), alpha, beta)
            y = conv3(v.astype(jnp.bfloat16), kh, jnp.float32)
            return depth_to_space(y.astype(jnp.bfloat16))

        timed("phase matmul+split-int8x2+int8conv+head+d2s", dec0_phase,
              xd, skp, km, pk_u, pk_s, pk2, pkh, chain_arg=2)

        # normal-domain split (concat elimination only, production dtypes)
        kc1a = ri8(42, (3, 3, 64, 64))
        kc1b = ri8(43, (3, 3, 64, 64))

        def dec0_split(x, sk, ku, ka, kb, k2, kh):
            u = lax.conv_transpose(
                x, ku, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            skc = sk[:, mg:-mg, mg:-mg, :]
            uq = jnp.clip(jnp.round(u.astype(jnp.float32) * 8.0),
                          -127., 127.).astype(jnp.int8)
            acc = conv3(skc, ka, jnp.int32) + conv3(uq, kb, jnp.int32)
            v = jnp.maximum(acc.astype(jnp.float32) * 1e-3, 0.
                            ).astype(jnp.bfloat16)
            v = jnp.maximum(conv3(v, k2, jnp.float32), 0.).astype(jnp.bfloat16)
            return conv3(v, kh, jnp.float32)

        timed("split (no concat) int8x2+bf16conv+head     ", dec0_split,
              xd, sk8, kt, kc1a, kc1b, kc2, khd, chain_arg=2)


    if "lvl1" in sections:
        # Recursive application: pack level 1 the same way (pool0 output
        # re-packed, pool1 consumes it). Wins only if the 2x2 rates at
        # 512-ch beat 1.78x the current per-layer rates.
        log(f"== level-1 atoms, b{b} x {tile}-in ==")
        e1 = sd2                   # 684 level-1 input
        a512 = jnp.ones((512,), jnp.float32) * 1e-3
        z512 = jnp.zeros((512,), jnp.float32)
        cases = [
            # (label, current?, shape args)
            ("cur enc1_conv1 3x3  64->128 bf16", "bf", e1, 64, 128, 3),
            ("cur enc1_conv2 3x3 128->128 int8", "i8", e1 - 2, 128, 128, 3),
            ("pck enc1_conv1 2x2 256->512 int8", "i8", e1 // 2, 256, 512, 2),
            ("pck enc1_conv2 2x2 512->512 int8", "i8", e1 // 2 - 1, 512, 512,
             2),
            ("cur dec1_conv1 3x3 256->128 int8", "i8", su + 4, 256, 128, 3),
            ("cur dec1_conv2 3x3 128->128 int8", "i8", su + 2, 128, 128, 3),
            ("pck dec1_conv1 2x2 1024->512 int8", "i8", (su + 4) // 2, 1024,
             512, 2),
            ("pck dec1_conv2 2x2 512->512 int8", "i8", (su + 2) // 2, 512,
             512, 2),
        ]
        for label, kind, ss, ci, co, kk in cases:
            fl = gf(b, ss - kk + 1, kk * kk, ci, co)
            if kind == "bf":
                x = rbf(50, (b, ss, ss, ci))
                w = rbf(51, (kk, kk, ci, co))
                timed(label, lambda x, w: conv3(
                    x, w, jnp.float32).astype(jnp.bfloat16), x, w, flops=fl)
            else:
                x = ri8(52, (b, ss, ss, ci))
                w = ri8(53, (kk, kk, ci, co))
                av = a512[:co]
                bv = z512[:co]
                timed(label, lambda x, w, a, be: epilogue_i8(conv3(
                    x, w, jnp.int32), a, be), x, w, av, bv, chain_arg=2,
                    flops=fl)
            del x, w


if __name__ == "__main__":
    main()
