"""Attribute the int4 e2e loss (results/r3/bench_int4_ab: phase-int4 388.3
vs phase-int8 ~410 honest, despite 2x per-layer conv rates in
results/r3/int4_probe2.txt).

Three experiments in ONE session (same chip window):

1. Chained-conv microbench at enc2_conv2 shape: 3 convs back-to-back with
   requantize epilogues — int8 chain vs int4 chain (u4s stored int8, cast
   per conv: the shipped formulation) vs int4 chain with IN-GRAPH int4
   storage (epilogue emits jnp.int4 directly; no per-conv cast, half the
   activation HBM bytes). Isolates "does composition kill the 2x" from
   engine plumbing.
2. Split-conv microbench at dec1_conv1 shape: the shipped split-kernel
   dual-scale int4 decoder conv vs the int8 concat formulation.
3. Cumulative-cutoff stage profile of BOTH engines (phase-int8 vs
   phase-int4) at the bench workload (16x1188) over the int4-affected
   stages; successive differences attribute the loss as composed.

Usage: python scripts/tpu_int4_attrib.py [batch] [tile_in]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.config import ModelConfig
from tpu_unet.infer.quant import build_quant_inference
from tpu_unet.models import UNet
from tpu_unet.ops.conv_tiles import conv3x3_int4_acc, conv3x3_int8_xla
from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def chain_microbench(rng):
    """3-conv chains at enc2_conv2 shape (338^2, 256ch, batch 8)."""
    b, h, c = 8, 344, 256
    x8 = jnp.asarray(rng.integers(-8, 8, (b, h, h, c)).astype(np.int8))
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, c)).astype(np.int8))
    w4 = jnp.asarray(rng.integers(-7, 8, (3, 3, c, c)).astype(np.int8))
    alpha = jnp.full((c,), 1e-3, jnp.float32)
    beta = jnp.zeros((c,), jnp.float32)

    def chain_i8(x, w):
        v = x
        for _ in range(3):
            v = conv3x3_int8_xla(v, w, alpha, beta, out_kind="int8")
        return jnp.sum(v.astype(jnp.int32))

    def chain_i4_i8store(x, w):
        v = x
        for _ in range(3):
            acc = conv3x3_int4_acc(v, w, shifted=True, emulate=False)
            y = jnp.maximum(acc.astype(jnp.float32) * alpha + beta, 0.0)
            v = (jnp.clip(jnp.round(y), 0.0, 15.0) - 8.0).astype(jnp.int8)
        return jnp.sum(v.astype(jnp.int32))

    def chain_i4_i4store(x, w):
        v = x.astype(jnp.int4)
        wi = w.astype(jnp.int4)
        corr = 8 * jnp.sum(w.astype(jnp.int32), axis=(0, 1, 2))
        for _ in range(3):
            dn = jax.lax.conv_dimension_numbers(v.shape, wi.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            acc = jax.lax.conv_general_dilated(
                v, wi, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32) + corr
            y = jnp.maximum(acc.astype(jnp.float32) * alpha + beta, 0.0)
            v = (jnp.clip(jnp.round(y), 0.0, 15.0) - 8.0).astype(jnp.int4)
        return jnp.sum(v.astype(jnp.int32))

    gf = 3 * (2 * 9 * c * c * (h - 2) * (h - 2) * b) / 1e9  # ~3 convs
    for name, fn, w in (("i8 chain      ", chain_i8, w8),
                        ("i4 chain i8st ", chain_i4_i8store, w4),
                        ("i4 chain i4st ", chain_i4_i4store, w4)):
        try:
            d = timeit_readback(lambda xx, _=None, f=fn, ww=w: f(xx, ww), x8)
            log(f"  {name}: {d*1e3:7.2f} ms  {gf/d/1e3:7.1f} T/s")
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")


def split_microbench(rng):
    """dec1_conv1 shape: split-kernel int4 (two cin-128 convs, the shipped
    path) vs one int8 conv of the 256-channel concat."""
    b, h = 16, 602
    c_sk = c_up = 128
    cout = 128
    sk = jnp.asarray(rng.integers(-8, 8, (b, h, h, c_sk)).astype(np.int8))
    up = jnp.asarray(rng.integers(-8, 8, (b, h, h, c_up)).astype(np.int8))
    w4 = jnp.asarray(rng.integers(-7, 8, (3, 3, 256, cout)).astype(np.int8))
    w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, cout)).astype(np.int8))
    s_w = jnp.full((cout,), 1e-3, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    def split_i4(a, bb):
        acc1 = conv3x3_int4_acc(a, w4[:, :, :c_sk], shifted=True,
                                emulate=False)
        acc2 = conv3x3_int4_acc(bb, w4[:, :, c_sk:], shifted=False,
                                emulate=False)
        t = acc1.astype(jnp.float32) * 0.01 + acc2.astype(jnp.float32) * 0.02
        y = jnp.maximum(t * s_w + bias, 0.0)
        v = (jnp.clip(jnp.round(y), 0.0, 15.0) - 8.0).astype(jnp.int8)
        return jnp.sum(v.astype(jnp.int32))

    def fused_i4(a, bb):
        cat = jnp.concatenate([a, bb], axis=-1)
        acc = conv3x3_int4_acc(cat, w4, shifted=True, emulate=False)
        y = jnp.maximum(acc.astype(jnp.float32) * s_w + bias, 0.0)
        v = (jnp.clip(jnp.round(y), 0.0, 15.0) - 8.0).astype(jnp.int8)
        return jnp.sum(v.astype(jnp.int32))

    def concat_i8(a, bb):
        cat = jnp.concatenate([a, bb], axis=-1)
        v = conv3x3_int8_xla(cat, w8, s_w, bias, out_kind="int8")
        return jnp.sum(v.astype(jnp.int32))

    gf = 2 * 9 * 256 * cout * (h - 2) * (h - 2) * b / 1e9
    for name, fn in (("i4 split 2x128", split_i4),
                     ("i4 concat 256 ", fused_i4),
                     ("i8 concat 256 ", concat_i8)):
        try:
            d = timeit_readback(lambda aa, _=None, f=fn: f(aa, up), sk)
            log(f"  {name}: {d*1e3:7.2f} ms  {gf/d/1e3:7.1f} T/s")
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")


STAGES = ["pool0", "enc1_conv2", "enc2_conv2", "enc3_conv2",
          "bottleneck_conv2", "dec3_conv1", "dec3_conv2", "dec2_conv1",
          "dec1_conv1", "dec1_conv2", "dec0_conv1", None]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tile_in = int(sys.argv[2]) if len(sys.argv) > 2 else 1348
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}")
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")
    rng = np.random.default_rng(0)

    log("== 1. chained-conv microbench (enc2_conv2 shape) ==")
    chain_microbench(rng)
    log("== 2. decoder split-conv microbench (dec1_conv1 shape) ==")
    split_microbench(rng)

    log(f"== 3. stage profile, batch {batch}, tile_in {tile_in} ==")
    cfg = ModelConfig(compute_dtype="bfloat16")
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (2, 444, 444, 1))
    qi8 = build_quant_inference(model, params, calib, min_channels=128,
                                phase_level0="int8")
    qi4 = build_quant_inference(model, params, calib, min_channels=128,
                                phase_level0="int8", int4=True)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (batch, tile_in, tile_in, 1), jnp.float32)
    prev8 = prev4 = 0.0
    for st in STAGES:
        label = st or "full(+head)"
        row = f"  {label:18s}"
        try:
            d8 = timeit_readback(
                lambda xx, _=None, st=st: qi8.apply(xx, stop_after=st), x)
            row += f" | i8 cum {d8*1e3:8.2f} stage {(d8-prev8)*1e3:+8.2f}"
            prev8 = d8
        except Exception as e:
            row += f" | i8 FAILED {type(e).__name__}"
        try:
            d4 = timeit_readback(
                lambda xx, _=None, st=st: qi4.apply(xx, stop_after=st), x)
            row += f" | i4 cum {d4*1e3:8.2f} stage {(d4-prev4)*1e3:+8.2f}"
            prev4 = d4
        except Exception as e:
            row += f" | i4 FAILED {type(e).__name__}"
        log(row)
    log("done")


if __name__ == "__main__":
    main()
