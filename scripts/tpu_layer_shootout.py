"""Per-layer serving-shape shootout: XLA bf16 vs XLA int8 vs Pallas int8.

One TPU session measures, at the exact serving geometry (tile_in=1212,
reference conv workload network.py:129-192), every quantized conv layer under
the three available backends, plus the upconv alternatives (conv_transpose vs
matmul+depth-to-space) and an MXU contraction-depth probe (chained square
dots per channel width, int8 vs bf16). Winners feed
`tpu_unet.ops.conv_tiles.BEST_CONFIGS` and `QuantInference.layer_impl`.

Usage:
  python scripts/tpu_layer_shootout.py [batch]        # full matrix
  python scripts/tpu_layer_shootout.py lowch [batch]  # int8-boundary layers
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_unet.ops.conv_tiles import best_config, conv3x3_fused, conv3x3_int8_xla
from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def attempt(label, fn, *args, tries=2):
    for i in range(tries):
        try:
            return timeit_readback(fn, *args)
        except Exception as e:  # remote compile helper 500s intermittently
            msg = str(e).split("\n")[0][:90]
            log(f"    {label} a{i+1} FAILED {type(e).__name__}: {msg}")
    return None


# (name, s_in, cin, cout) at tile_in=1212 — exact serving sizes.
QUANT_LAYERS = [
    ("enc1_conv2", 602, 128, 128),
    ("enc2_conv1", 300, 128, 256),
    ("enc2_conv2", 298, 256, 256),
    ("enc3_conv1", 148, 256, 512),
    ("enc3_conv2", 146, 512, 512),
    ("bott_conv1", 72, 512, 1024),
    ("bott_conv2", 70, 1024, 1024),
    ("dec3_conv1", 136, 1024, 512),
    ("dec3_conv2", 134, 512, 512),
    ("dec2_conv1", 264, 512, 256),
    ("dec2_conv2", 262, 256, 256),
    ("dec1_conv1", 520, 256, 128),
    ("dec1_conv2", 518, 128, 128),
]
FLOAT_LAYERS = [
    ("enc0_conv1", 1212, 1, 64),
    ("enc0_conv2", 1210, 64, 64),
    ("enc1_conv1", 604, 64, 128),
    ("dec0_conv1", 1032, 128, 64),
    ("dec0_conv2", 1030, 64, 64),
]
UPCONVS = [
    ("up3", 68, 1024, 512),
    ("up2", 132, 512, 256),
    ("up1", 260, 256, 128),
    ("up0", 516, 128, 64),
]


def conv_bf16(x, w, b):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)


def run_lowch(batch, rng):
    """Decision matrix for the layers near the int8 profitability boundary:
    bf16 vs int8-xla at the exact serving shapes, adaptive reps."""
    shapes = [
        ("enc1_conv1", 604, 64, 128),
        ("enc0_conv2", 1210, 64, 64),
        ("dec0_conv1", 1032, 128, 64),
        ("dec0_conv2", 1030, 64, 64),
        ("dec1_conv1", 520, 256, 128),
        ("dec1_conv2", 518, 128, 128),
        ("enc1_conv2", 602, 128, 128),
    ]
    for name, s, cin, cout in shapes:
        gf = 2 * 9 * (s - 2) ** 2 * cin * cout * batch / 1e9
        xb = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bb = jnp.zeros((cout,), jnp.float32)
        xi = jax.random.randint(rng, (batch, s, s, cin), 0, 127, jnp.int8)
        wi = jax.random.randint(rng, (3, 3, cin, cout), -127, 128, jnp.int8)
        al = jnp.full((cout,), 1e-4, jnp.float32)
        be = jnp.zeros((cout,), jnp.float32)
        d_bf = attempt(f"{name} bf16", conv_bf16, xb, wb, bb)
        d_xq = attempt(
            f"{name} int8-xla",
            lambda x, w: conv3x3_int8_xla(x, w, al, be, out_kind="int8"),
            xi, wi)
        fmt = lambda d: (f"{d*1e3:8.2f} ms {gf/d/1e3:6.1f} T/s" if d
                         else "     FAILED        ")
        log(f"  {name:11s} {s:4d}^2 {cin:4d}->{cout:4d}:"
            f"  bf16 {fmt(d_bf)} | int8-xla {fmt(d_xq)}")


def run_enc0(batch, rng):
    """Pallas configs for the wide shallow 64-channel layers — the XLA bf16
    path runs them at only ~65-95 T/s (shootout.txt), so even a modest tile
    kernel could win. Probes (variant x br x kind) per shape; the round-2
    tune's enc0/dec0 attempts all failed to compile at br>=8 (VMEM), so br=4
    is included."""
    shapes = [
        ("enc0_conv2", 1210, 64, 64),
        ("dec0_conv1", 1032, 128, 64),
        ("dec0_conv2", 1030, 64, 64),
    ]
    for name, s, cin, cout in shapes:
        gf = 2 * 9 * (s - 2) ** 2 * cin * cout * batch / 1e9
        for kind in ("int8", "bf16"):
            if kind == "int8":
                x = jax.random.randint(rng, (batch, s, s, cin), 0, 127,
                                       jnp.int8)
                w = jax.random.randint(rng, (3, 3, cin, cout), -127, 128,
                                       jnp.int8)
            else:
                x = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
                w = jax.random.normal(rng, (3, 3, cin, cout),
                                      jnp.bfloat16) * 0.05
            al = jnp.full((cout,), 1e-4, jnp.float32)
            be = jnp.zeros((cout,), jnp.float32)
            best = None
            for variant in ("nconcat", "taps"):
                for br in (4, 8, 16):
                    d = attempt(
                        f"{name} {kind} {variant} br={br}",
                        lambda xx, ww: conv3x3_fused(
                            xx, ww, al, be, block_rows=br, cout_tile=cout,
                            variant=variant), x, w, tries=1)
                    if d is not None:
                        log(f"    {name} {kind} {variant} br={br}: "
                            f"{d*1e3:7.2f} ms {gf/d/1e3:6.1f} T/s")
                        if best is None or d < best[0]:
                            best = (d, variant, br)
            if best:
                d, variant, br = best
                log(f"  BEST {name} {kind}: {variant} br={br} "
                    f"{d*1e3:7.2f} ms {gf/d/1e3:6.1f} T/s")


def run_pair0(batch, rng):
    """Batch-pairing for the encoder level-0 convs: XLA pads 64-channel convs
    to the 128-lane tile (enc0_conv2 measures exactly 4x enc1_conv2's
    128-channel time = pure padded cost), so folding TWO batch images into
    the channel dim makes the padding useful — half the padded FLOPs. The
    block-diagonal kernel keeps the images independent (zeros off-diagonal).
    Measures plain vs paired enc0 pipelines end-to-end (conv1 1->64, conv2
    64->64, pool), including the pair/unpair transposes."""
    s = 1212
    x = jax.random.uniform(rng, (batch, s, s, 1), jnp.float32)
    k1 = jax.random.normal(rng, (3, 3, 1, 64), jnp.bfloat16) * 0.2
    k2 = jax.random.normal(rng, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    b1 = jnp.zeros((64,), jnp.float32)
    b2 = jnp.zeros((64,), jnp.float32)

    def convr(v, k, b):
        dn = lax.conv_dimension_numbers(v.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(v, k, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)

    def pool(v):
        return lax.reduce_window(v, -jnp.inf if v.dtype != jnp.int8 else
                                 jnp.int8(-128), lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def plain(x, k1):
        v = convr(x.astype(jnp.bfloat16), k1, b1)
        v = convr(v, k2, b2)
        return pool(v)

    # block-diagonal paired kernels, built once (weights are tiny)
    z = jnp.zeros_like(k1)
    k1p = jnp.concatenate([jnp.concatenate([k1, z], -1),
                           jnp.concatenate([z, k1], -1)], -2)  # [3,3,2,128]
    z2 = jnp.zeros_like(k2)
    k2p = jnp.concatenate([jnp.concatenate([k2, z2], -1),
                           jnp.concatenate([z2, k2], -1)], -2)  # [3,3,128,128]
    b1p = jnp.concatenate([b1, b1])
    b2p = jnp.concatenate([b2, b2])

    def paired(x, k1):
        bsz = x.shape[0]
        xp = x.reshape(bsz // 2, 2, s, s, 1).transpose(0, 2, 3, 1, 4)
        xp = xp.reshape(bsz // 2, s, s, 2)
        zk = jnp.zeros_like(k1)
        k1p_ = jnp.concatenate([jnp.concatenate([k1, zk], -1),
                                jnp.concatenate([zk, k1], -1)], -2)
        v = convr(xp.astype(jnp.bfloat16), k1p_, b1p)
        v = convr(v, k2p, b2p)
        v = pool(v)                                   # [B/2, 604, 604, 128]
        h = v.shape[1]
        v = v.reshape(bsz // 2, h, h, 2, 64).transpose(0, 3, 1, 2, 4)
        return v.reshape(bsz, h, h, 64)

    d1 = attempt("enc0 plain", plain, x, k1)
    d2 = attempt("enc0 paired", paired, x, k1)
    fmt = lambda d: f"{d*1e3:8.2f} ms" if d else "FAILED"
    log(f"  enc0 level (conv1+conv2+pool+unpair, batch {batch}): "
        f"plain {fmt(d1)}  paired-blockdiag {fmt(d2)}")

    # decoder-side candidate: dec0_conv2 (64->64 at 1030^2) alone with
    # pair/unpair transposes around it
    s2 = 1030
    y0 = jax.random.normal(rng, (batch, s2, s2, 64), jnp.bfloat16)

    def plain_d(v, k2):
        return convr(v, k2, b2)

    def paired_d(v, k2):
        bsz = v.shape[0]
        zk = jnp.zeros_like(k2)
        kp = jnp.concatenate([jnp.concatenate([k2, zk], -1),
                              jnp.concatenate([zk, k2], -1)], -2)
        vp = v.reshape(bsz // 2, 2, s2, s2, 64).transpose(0, 2, 3, 1, 4)
        vp = vp.reshape(bsz // 2, s2, s2, 128)
        o = convr(vp, kp, jnp.concatenate([b2, b2]))
        h = o.shape[1]
        o = o.reshape(bsz // 2, h, h, 2, 64).transpose(0, 3, 1, 2, 4)
        return o.reshape(bsz, h, h, 64)

    d3 = attempt("dec0_conv2 plain", plain_d, y0, k2)
    d4 = attempt("dec0_conv2 paired", paired_d, y0, k2)
    log(f"  dec0_conv2 (batch {batch}): plain {fmt(d3)}  "
        f"paired+transposes {fmt(d4)}")


def run_pairq(batch, rng):
    """Does pairing also pay for the int8 128-channel layers? int8 per-layer
    rates rise with cin (245 T/s at 128 -> ~500 at 512, shootout.txt): if
    that's K-padding waste, a block-diagonal paired conv at (B/2, 2cin)
    should cost the same wall time as the unpaired one (halving effective
    cost); if it's pipeline depth, paired costs ~2x."""
    shapes = [("enc1_conv2", 602, 128, 128), ("dec1_conv1", 520, 256, 128)]
    for name, s, cin, cout in shapes:
        xi = jax.random.randint(rng, (batch, s, s, cin), 0, 127, jnp.int8)
        wi = jax.random.randint(rng, (3, 3, cin, cout), -127, 128, jnp.int8)
        al = jnp.full((cout,), 1e-4, jnp.float32)
        be = jnp.zeros((cout,), jnp.float32)

        def plain(x, w):
            return conv3x3_int8_xla(x, w, al, be, out_kind="int8")

        def paired(x, w):
            bsz = x.shape[0]
            xp = jnp.concatenate([x[:bsz // 2], x[bsz // 2:]], axis=-1)
            z = jnp.zeros_like(w)
            wp = jnp.concatenate([jnp.concatenate([w, z], -1),
                                  jnp.concatenate([z, w], -1)], -2)
            y = conv3x3_int8_xla(xp, wp, jnp.concatenate([al, al]),
                                 jnp.concatenate([be, be]), out_kind="int8")
            return jnp.concatenate([y[..., :cout], y[..., cout:]], axis=0)

        d1 = attempt(f"{name} int8 plain", plain, xi, wi)
        d2 = attempt(f"{name} int8 paired", paired, xi, wi)
        fmt = lambda d: f"{d*1e3:8.2f} ms" if d else "FAILED"
        log(f"  {name} {s}^2 {cin}->{cout} int8 (batch {batch}): "
            f"plain {fmt(d1)}  paired+concats {fmt(d2)}")


def run_pair0c(batch, rng):
    """Component costs of the level-0 pairing (bench_run2 measured the
    integrated form 13% SLOWER e2e): isolate each pair/unpair data movement
    and each paired-vs-plain conv so the losing step is identified."""
    s = 1212
    x = jax.random.uniform(rng, (batch, s, s, 1), jnp.float32)
    xp = jnp.concatenate([x[:batch // 2], x[batch // 2:]], axis=-1)
    v604 = jax.random.normal(rng, (batch // 2, 604, 604, 128), jnp.bfloat16)
    v1032 = jax.random.normal(rng, (batch // 2, 1032, 1032, 128), jnp.bfloat16)
    u64 = jax.random.normal(rng, (batch, 1032, 1032, 64), jnp.bfloat16)
    k1 = jax.random.normal(rng, (3, 3, 1, 64), jnp.bfloat16) * 0.2
    k2 = jax.random.normal(rng, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    b64 = jnp.zeros((64,), jnp.float32)

    def convr(v, k, b):
        dn = lax.conv_dimension_numbers(v.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(v, k, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)

    def bd(k):
        z = jnp.zeros_like(k)
        return jnp.concatenate([jnp.concatenate([k, z], -1),
                                jnp.concatenate([z, k], -1)], -2)

    cases = [
        ("pair input f32 1ch", lambda a, _:
            jnp.concatenate([a[:batch // 2], a[batch // 2:]], -1), x, k1),
        ("conv1 plain 1->64", lambda a, k: convr(a.astype(jnp.bfloat16), k,
                                                 b64), x, k1),
        ("conv1 paired 2->128", lambda a, k:
            convr(a.astype(jnp.bfloat16), bd(k),
                  jnp.concatenate([b64, b64])), xp, k1),
        ("unpair 604^2x128", lambda a, _:
            jnp.concatenate([a[..., :64], a[..., 64:]], 0) * 1.0, v604, k1),
        ("unpair 1032^2x128", lambda a, _:
            jnp.concatenate([a[..., :64], a[..., 64:]], 0) * 1.0, v1032, k1),
        ("pair u 1032^2x64", lambda a, _:
            jnp.concatenate([a[:batch // 2], a[batch // 2:]], -1) * 1.0,
            u64, k1),
        ("cat4 interleave+quant", lambda a, v:
            jnp.clip(jnp.round(jnp.concatenate(
                [v[..., :64], a[:batch // 2],
                 v[..., 64:], a[batch // 2:]],
                -1).astype(jnp.float32) * 8.0), -127, 127).astype(jnp.int8),
            u64, v1032),
    ]
    for name, fn, a, k in cases:
        d = attempt(name, fn, a, k)
        log(f"  {name:24s}: {d*1e3:8.2f} ms" if d else f"  {name}: FAILED")

    s2 = 1210
    y64 = jax.random.normal(rng, (batch, s2, s2, 64), jnp.bfloat16)
    y128 = jax.random.normal(rng, (batch // 2, s2, s2, 128), jnp.bfloat16)
    d1 = attempt("conv2 plain 64->64", lambda a, k: convr(a, k, b64), y64, k2)
    d2 = attempt("conv2 paired 128bd",
                 lambda a, k: convr(a, bd(k), jnp.concatenate([b64, b64])),
                 y128, k2)
    fmt = lambda d: f"{d*1e3:8.2f} ms" if d else "FAILED"
    log(f"  conv2 plain {fmt(d1)}  paired {fmt(d2)}")


def run_pairk(batch, rng):
    """Pallas pair/unpair/interleave kernels (ops/interleave.py) vs the XLA
    concat formulation, at the serving shapes where XLA measured 4-10x off
    bandwidth (shootout_pair0c.txt)."""
    from tpu_unet.ops.interleave import (
        interleave_pairs, pair_batch_channels, unpair_batch_channels)

    v604 = jax.random.normal(rng, (batch // 2, 604, 604, 128), jnp.bfloat16)
    v1032 = jax.random.normal(rng, (batch // 2, 1032, 1032, 128),
                              jnp.bfloat16)
    u64 = jax.random.normal(rng, (batch, 1032, 1032, 64), jnp.bfloat16)

    cases = [
        ("unpair 604^2x128 xla", lambda a, _:
            jnp.concatenate([a[..., :64], a[..., 64:]], 0) * 1.0, v604),
        ("unpair 604^2x128 pallas", lambda a, _:
            unpair_batch_channels(a) * 1.0, v604),
        ("unpair 1032^2x128 xla", lambda a, _:
            jnp.concatenate([a[..., :64], a[..., 64:]], 0) * 1.0, v1032),
        ("unpair 1032^2x128 pallas", lambda a, _:
            unpair_batch_channels(a) * 1.0, v1032),
        ("pair u 1032^2x64 xla", lambda a, _:
            jnp.concatenate([a[:batch // 2], a[batch // 2:]], -1) * 1.0, u64),
        ("pair u 1032^2x64 pallas", lambda a, _:
            pair_batch_channels(a) * 1.0, u64),
        ("interleave 1032^2 pallas", lambda a, v:
            interleave_pairs(v, pair_batch_channels(a)) * 1.0, u64),
    ]
    for name, fn, a in cases:
        d = attempt(name, fn, a, v1032)
        log(f"  {name:26s}: {d*1e3:8.2f} ms" if d else f"  {name}: FAILED")


def run_pool(batch, rng):
    """pool0 (2x2/stride-2 max on [B,1208,1208,64] bf16) measured 6.1 ms in
    the stage profile — 4x off bandwidth. reduce_window vs 4-slice max vs
    reshape-max formulations."""
    x = jax.random.normal(rng, (batch, 1208, 1208, 64), jnp.bfloat16)

    def rw(v, _):
        return lax.reduce_window(v, -jnp.inf, lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def slices(v, _):
        a = jnp.maximum(v[:, ::2, ::2], v[:, 1::2, ::2])
        b = jnp.maximum(v[:, ::2, 1::2], v[:, 1::2, 1::2])
        return jnp.maximum(a, b)

    def reshaped(v, _):
        bsz, h, w, c = v.shape
        v = v.reshape(bsz, h // 2, 2, w // 2, 2, c)
        return v.max(axis=(2, 4))

    for name, fn in (("reduce_window", rw), ("4-slice max", slices),
                     ("reshape max", reshaped)):
        d = attempt(name, fn, x, None)
        log(f"  {name:16s}: {d*1e3:8.2f} ms" if d else f"  {name}: FAILED")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() \
        else "full"
    batch = int(sys.argv[-1]) if sys.argv[-1:] and sys.argv[-1].isdigit() else 8
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}, batch {batch}")

    log(f"tunnel roundtrip {measure_roundtrip()*1e3:.1f} ms")
    rng = jax.random.PRNGKey(0)

    if mode == "lowch":
        log(f"== low-channel boundary layers (batch {batch}) ==")
        run_lowch(batch, rng)
        log("done")
        return
    if mode == "enc0":
        log(f"== wide shallow 64-ch layers, Pallas configs (batch {batch}) ==")
        run_enc0(batch, rng)
        log("done")
        return
    if mode == "pair0":
        log(f"== level-0 batch pairing (batch {batch}) ==")
        run_pair0(batch, rng)
        log("done")
        return
    if mode == "pairq":
        log(f"== int8 128-ch pairing probe (batch {batch}) ==")
        run_pairq(batch, rng)
        log("done")
        return
    if mode == "pair0c":
        log(f"== level-0 pairing component costs (batch {batch}) ==")
        run_pair0c(batch, rng)
        log("done")
        return
    if mode == "pairk":
        log(f"== Pallas pair/unpair/interleave kernels (batch {batch}) ==")
        run_pairk(batch, rng)
        log("done")
        return
    if mode == "pool":
        log(f"== pool0 formulations (batch {batch}) ==")
        run_pool(batch, rng)
        log("done")
        return

    # --- MXU contraction-depth probe: chained square dots ------------------
    log("== MXU depth probe: chained dot [4096,c]@[c,c] x64 ==")
    reps = 64
    m = 4096
    for c in (64, 128, 256, 512, 1024):
        for kind in ("int8", "bf16"):
            if kind == "int8":
                x = jnp.ones((m, c), jnp.int8)
                w = jnp.ones((c, c), jnp.int8)

                def chain(x, w):
                    def body(cx, _):
                        y = lax.dot(cx, w, preferred_element_type=jnp.int32)
                        return jnp.clip(y, -1, 1).astype(jnp.int8), None
                    y, _ = lax.scan(body, x, None, length=reps)
                    return jnp.sum(y.astype(jnp.float32))
            else:
                x = jnp.full((m, c), 1.0 / c, jnp.bfloat16)
                w = jnp.full((c, c), 1.0 / c, jnp.bfloat16)

                def chain(x, w):
                    def body(cx, _):
                        y = lax.dot(cx, w, preferred_element_type=jnp.float32)
                        return y.astype(jnp.bfloat16), None
                    y, _ = lax.scan(body, x, None, length=reps)
                    return jnp.sum(y.astype(jnp.float32))

            # timeit returns seconds per one chain call = `reps` dots
            dt = attempt(f"dot c={c} {kind}", chain, x, w)
            if dt is None:
                continue
            log(f"  dot[{m}x{c}]@[{c}x{c}] {kind}: {dt/reps*1e6:8.1f} us/dot "
                f"{2*m*c*c*reps/dt/1e12:6.1f} T/s")

    # --- per-layer conv shootout -------------------------------------------
    log("== quantized conv layers ==")
    rows = []
    for name, s, cin, cout in QUANT_LAYERS:
        gf = 2 * 9 * (s - 2) ** 2 * cin * cout * batch / 1e9
        xb = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bb = jnp.zeros((cout,), jnp.float32)
        xi = jax.random.randint(rng, (batch, s, s, cin), 0, 127, jnp.int8)
        wi = jax.random.randint(rng, (3, 3, cin, cout), -127, 128, jnp.int8)
        al = jnp.full((cout,), 1e-4, jnp.float32)
        be = jnp.zeros((cout,), jnp.float32)

        d_bf = attempt(f"{name} bf16-xla", conv_bf16, xb, wb, bb)
        d_xq = attempt(
            f"{name} int8-xla",
            lambda x, w: conv3x3_int8_xla(x, w, al, be, out_kind="int8"),
            xi, wi)
        var, br, ct = best_config(cin, cout)
        d_pq = attempt(
            f"{name} int8-pallas[{var},br{br},ct{ct}]",
            lambda x, w: conv3x3_fused(x, w, al, be, out_kind="int8",
                                       block_rows=br, cout_tile=ct,
                                       variant=var),
            xi, wi)
        fmt = lambda d: f"{d*1e3:8.2f} ms {gf/d/1e3:6.1f} T/s" if d else "     FAILED        "
        log(f"  {name:11s} {s:4d}^2 {cin:4d}->{cout:4d}:"
            f"  bf16 {fmt(d_bf)} | int8-xla {fmt(d_xq)}"
            f" | int8-pl[{var:7s}] {fmt(d_pq)}")
        rows.append((name, d_bf, d_xq, d_pq))

    log("== float (low-channel) conv layers: bf16-xla ==")
    for name, s, cin, cout in FLOAT_LAYERS:
        gf = 2 * 9 * (s - 2) ** 2 * cin * cout * batch / 1e9
        xb = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bb = jnp.zeros((cout,), jnp.float32)
        d = attempt(f"{name} bf16", conv_bf16, xb, wb, bb)
        if d:
            log(f"  {name:11s} {s:4d}^2 {cin:4d}->{cout:4d}: {d*1e3:8.2f} ms "
                f"{gf/d/1e3:6.1f} T/s")

    # --- upconv alternatives ------------------------------------------------
    log("== upconv (2x2 stride 2): tconv vs matmul+d2s ==")
    for name, s, cin, cout in UPCONVS:
        xb = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(rng, (2, 2, cin, cout), jnp.bfloat16) * 0.05
        gf = 2 * 4 * cin * cout * batch * s * s / 1e9

        def tconv(x, w):
            return lax.conv_transpose(
                x, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def mm(x, w):
            bb_, h, wd, ci = x.shape
            co = w.shape[-1]
            wr = w.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
            y = jnp.dot(x.reshape(-1, ci), wr,
                        preferred_element_type=jnp.float32)
            y = y.astype(jnp.bfloat16).reshape(bb_, h, wd, 2, 2, co)
            return y.transpose(0, 1, 3, 2, 4, 5).reshape(bb_, 2 * h, 2 * wd, co)

        d1 = attempt(f"{name} tconv", tconv, xb, wb)
        d2 = attempt(f"{name} mm+d2s", mm, xb, wb)
        fmt = lambda d: f"{d*1e3:7.2f} ms ({gf/d/1e3:5.1f} T/s)" if d else "FAILED"
        log(f"  {name} {s:4d}^2 {cin:4d}->{cout:4d}: tconv {fmt(d1)}  "
            f"mm+d2s {fmt(d2)}")

    log("done")


if __name__ == "__main__":
    main()
