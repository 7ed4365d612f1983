"""Tune the fused Pallas conv variants per serving shape (round 2).

[Archived probe: timing predates utils/profiling.timeit_readback; superseded
by scripts/tpu_layer_shootout.py. Kept with its results in results/r2/.]

Probes (variant x block_rows) per dominant U-Net conv shape at the serving
tile (batch 16 x 1212-in), int8 and bf16, with a VMEM-aware config filter and
one retry (the env's remote compile helper 500s intermittently). Prints one
winner line per shape; feed the winners into ops/conv_tiles.BEST_CONFIGS.

Usage: python scripts/tpu_conv_tune.py [int8|bf16] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_unet.ops.conv_tiles import conv3x3_fused


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


ROUNDTRIP = 0.03


def measure_roundtrip():
    global ROUNDTRIP

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(6):
        float(noop(jnp.int32(0)))
    ROUNDTRIP = (time.perf_counter() - t0) / 6
    log(f"tunnel roundtrip {ROUNDTRIP*1e3:.1f} ms")


def timeit(fn, *args, n=3, reps=6):
    """Median per-op seconds via dependency-chained reps in one jit
    (CLAUDE.md: block_until_ready is a no-op on this backend)."""

    @jax.jit
    def run(*a):
        def body(c, _):
            aa = list(a)
            aa[1] = aa[1] + (c * 1e-30).astype(aa[1].dtype)
            y = fn(*aa)
            return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return s

    float(run(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0 - ROUNDTRIP) / reps)
    return float(np.median(times))


# The 10 FLOP-dominant conv shapes at serving tile 1212 (s_in, cin, cout).
SHAPES = [
    ("enc0_conv2", 1208, 64, 64),
    ("enc1_conv1", 604, 64, 128),
    ("enc1_conv2", 600, 128, 128),
    ("enc2_conv2", 296, 256, 256),
    ("enc3_conv2", 144, 512, 512),
    ("bott_conv2", 70, 1024, 1024),
    ("dec3_conv1", 136, 1024, 512),
    ("dec2_conv1", 262, 512, 256),
    ("dec1_conv1", 518, 256, 128),
    ("dec0_conv1", 1030, 128, 64),
    ("dec0_conv2", 1028, 64, 64),
]

VMEM_BUDGET = 13e6  # leave headroom below the 16MB/core VMEM


def vmem_bytes(variant, br, s, cin, ct, itemsize):
    wo = s - 2
    slab = (br + 2) * s * cin * itemsize
    wght = 9 * cin * ct * itemsize
    out = br * wo * ct * (1 if itemsize == 1 else 2)
    acc = br * wo * ct * 4
    buf = {"rows3": br * wo * 3 * cin, "im2col": br * wo * 9 * cin}.get(
        variant, 0) * itemsize
    y = br * s * 3 * ct * 4 if variant == "nconcat" else 0
    return slab + wght + out + acc + buf + y


def main():
    kinds = [sys.argv[1]] if len(sys.argv) > 1 else ["int8", "bf16"]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}")
    measure_roundtrip()
    rng = jax.random.PRNGKey(0)
    winners = {}
    for name, s, cin, cout in SHAPES:
        for kind in kinds:
            itemsize = 1 if kind == "int8" else 2
            if kind == "int8":
                x = jax.random.randint(rng, (batch, s, s, cin), -127, 128,
                                       jnp.int8)
                w = jax.random.randint(rng, (3, 3, cin, cout), -127, 128,
                                       jnp.int8)
            else:
                x = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
                w = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16)
            a = jnp.full((cout,), 1e-3, jnp.float32)
            b = jnp.zeros((cout,), jnp.float32)
            best = None
            for variant in ("im2col", "rows3", "nconcat", "taps"):
                for br in (32, 16, 8):
                    ct = min(cout, 256)
                    if vmem_bytes(variant, br, s, cin, ct, itemsize) > VMEM_BUDGET:
                        continue
                    for attempt in (1, 2):
                        try:
                            f = jax.jit(
                                lambda x, w, a, b, br=br, ct=ct, v=variant:
                                conv3x3_fused(x, w, a, b, block_rows=br,
                                              cout_tile=ct, variant=v))
                            dt = timeit(f, x, w, a, b)
                            log(f"    {name} {kind} {variant} br={br}: "
                                f"{dt*1e3:.2f} ms")
                            if best is None or dt < best[0]:
                                best = (dt, variant, br, ct)
                            break
                        except Exception as e:
                            log(f"    {name} {kind} {variant} br={br} "
                                f"a{attempt}: FAILED {type(e).__name__}: "
                                f"{str(e)[:90]}")
            del x, w
            if best:
                dt, variant, br, ct = best
                gf = 2 * 9 * cin * cout * batch * (s - 2) ** 2 / 1e9
                winners[(name, kind)] = (variant, br, ct, gf / dt / 1e3)
                log(f"  WINNER {name:12s} {kind}  {s:5d}^2 {cin:4d}->{cout:4d} "
                    f" {dt*1e3:7.2f} ms  {gf/dt/1e3:6.1f} T/s  "
                    f"({variant} br={br} ct={ct})")
    log("== summary ==")
    for (name, kind), (variant, br, ct, ts) in winners.items():
        log(f"  {name:12s} {kind}: {variant:7s} br={br:2d} ct={ct:3d} "
            f"{ts:6.1f} T/s")


if __name__ == "__main__":
    main()
