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


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


ROUNDTRIP = 0.03


def timeit(fn, *args, n=3, reps=6, min_work_s=0.3):
    """Median seconds per fn call. Adaptive: if `reps` calls take less than
    `min_work_s`, re-jit with enough reps that the measured work dominates
    the ~30 ms tunnel roundtrip (short chains are roundtrip-noise-dominated:
    the first shootout run printed 658 T/s bf16 dots, 3x over peak)."""

    def make(reps):
        @jax.jit
        def run(*a):
            def body(c, _):
                aa = list(a)
                aa[0] = (aa[0] + c.astype(aa[0].dtype)) \
                    if aa[0].dtype == jnp.int8 \
                    else aa[0] + (c * 1e-30).astype(aa[0].dtype)
                y = fn(*aa)
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
            return s
        return run

    run = make(reps)
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    est = (time.perf_counter() - t0 - ROUNDTRIP) / reps
    if est * reps < min_work_s:
        reps = min(512, max(reps, int(np.ceil(min_work_s / max(est, 1e-6)))))
        run = make(reps)
        float(run(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0 - ROUNDTRIP) / reps)
    return float(np.median(times))


def attempt(label, fn, *args, tries=2):
    for i in range(tries):
        try:
            return timeit(fn, *args)
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


def main():
    global ROUNDTRIP
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() \
        else "full"
    batch = int(sys.argv[-1]) if sys.argv[-1:] and sys.argv[-1].isdigit() else 8
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}, batch {batch}")

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(6):
        float(noop(jnp.int32(0)))
    ROUNDTRIP = (time.perf_counter() - t0) / 6
    log(f"tunnel roundtrip {ROUNDTRIP*1e3:.1f} ms")
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
