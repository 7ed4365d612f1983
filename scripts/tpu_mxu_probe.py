"""MXU rate vs contraction depth: chained dots at the U-Net's per-layer
(K=cin, N=cout) shapes, int8 vs bf16 — isolates the systolic-array rate from
all conv/slab logic. Decides whether the Pallas conv's falloff below 512
channels is an MXU-shape limit or kernel overhead.

Also: upconv as matmul+depth-to-space in int8 vs bf16 (the 2x2/stride-2
transpose conv is overlap-free, i.e. a pure matmul).

Usage: python scripts/tpu_mxu_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}")

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(6):
        float(noop(jnp.int32(0)))
    roundtrip = (time.perf_counter() - t0) / 6
    log(f"roundtrip {roundtrip*1e3:.1f} ms")

    # --- chained square-ish dots: M=4096, K=N=c (layer channel widths) ----
    reps = 64
    for c in (64, 128, 256, 512, 1024):
        m = 4096
        for kind in ("int8", "bf16"):
            if kind == "int8":
                x = jnp.ones((m, c), jnp.int8)
                w = jnp.ones((c, c), jnp.int8)

                @jax.jit
                def chain(x, w):
                    def body(cx, _):
                        y = lax.dot(cx, w, preferred_element_type=jnp.int32)
                        return jnp.clip(y, -1, 1).astype(jnp.int8), None
                    y, _ = lax.scan(body, x, None, length=reps)
                    return jnp.sum(y.astype(jnp.float32))
            else:
                x = jnp.full((m, c), 1.0 / c, jnp.bfloat16)
                w = jnp.full((c, c), 1.0 / c, jnp.bfloat16)

                @jax.jit
                def chain(x, w):
                    def body(cx, _):
                        y = lax.dot(cx, w, preferred_element_type=jnp.float32)
                        return y.astype(jnp.bfloat16), None
                    y, _ = lax.scan(body, x, None, length=reps)
                    return jnp.sum(y.astype(jnp.float32))

            float(chain(x, w))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chain(x, w))
                times.append(time.perf_counter() - t0 - roundtrip)
            dt = float(np.median(times)) / reps
            ts = 2 * m * c * c / dt / 1e12
            log(f"  dot[{m}x{c}]@[{c}x{c}] {kind}: {dt*1e6:8.1f} us  "
                f"{ts:6.1f} T/s")

    # --- peak: 8192^3 ----------------------------------------------------
    n = 8192
    for kind in ("int8", "bf16"):
        if kind == "int8":
            x = jnp.ones((n, n), jnp.int8)

            @jax.jit
            def chain(a):
                def body(c, _):
                    y = lax.dot(c, c, preferred_element_type=jnp.int32)
                    return jnp.clip(y, -1, 1).astype(jnp.int8), None
                y, _ = lax.scan(body, a, None, length=16)
                return jnp.sum(y.astype(jnp.float32))
        else:
            x = jnp.full((n, n), 1.0 / n, jnp.bfloat16)

            @jax.jit
            def chain(a):
                def body(c, _):
                    return (c @ c).astype(jnp.bfloat16), None
                y, _ = lax.scan(body, a, None, length=16)
                return jnp.sum(y.astype(jnp.float32))

        float(chain(x))
        t0 = time.perf_counter()
        float(chain(x))
        dt = (time.perf_counter() - t0 - roundtrip) / 16
        log(f"  peak {kind} 8192^3: {2 * n**3 / dt / 1e12:6.1f} T/s")

    # --- upconv: conv_transpose vs matmul+d2s, bf16 vs int8-matmul --------
    log("== upconv (2x2 stride 2) ==")
    rng = jax.random.PRNGKey(0)
    for s, cin, cout in ((68, 1024, 512), (132, 512, 256), (260, 256, 128),
                         (516, 128, 64)):
        b = 8
        xb = jax.random.normal(rng, (b, s, s, cin), jnp.bfloat16)
        wb = jax.random.normal(rng, (2, 2, cin, cout), jnp.bfloat16)
        xi = jax.random.randint(rng, (b, s, s, cin), -127, 128, jnp.int8)
        wi = jax.random.randint(rng, (2, 2, cin, cout), -127, 128, jnp.int8)

        @jax.jit
        def tconv(x, w):
            return lax.conv_transpose(
                x, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def mm(x, w, acc):
            bb, h, wd, ci = x.shape
            co = w.shape[-1]
            wr = w.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
            y = jnp.dot(x.reshape(-1, ci), wr, preferred_element_type=acc)
            y = y.astype(jnp.bfloat16).reshape(bb, h, wd, 2, 2, co)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(bb, 2 * h, 2 * wd, co)

        mmb = jax.jit(lambda x, w: mm(x, w, jnp.float32))
        mmi = jax.jit(lambda x, w: mm(x, w, jnp.int32))

        def timeit(f, x, w, reps=8):
            @jax.jit
            def run(x, w):
                def body(c, _):
                    y = f(x + (c * 1e-30).astype(x.dtype), w)
                    return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
                ss, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
                return ss
            float(run(x, w))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x, w))
                times.append((time.perf_counter() - t0 - roundtrip) / reps)
            return float(np.median(times))

        gf = 2 * 4 * cin * cout * b * s * s / 1e9
        d1 = timeit(tconv, xb, wb)
        d2 = timeit(mmb, xb, wb)
        d3 = timeit(mmi, xi, wi)
        log(f"  up {s:4d}^2 {cin:4d}->{cout:4d}: tconv {d1*1e3:7.2f} ms "
            f"({gf/d1/1e3:5.1f}) mm-bf16 {d2*1e3:7.2f} ms ({gf/d2/1e3:5.1f}) "
            f"mm-int8 {d3*1e3:7.2f} ms ({gf/d3/1e3:5.1f} T/s)")

    log("done")


if __name__ == "__main__":
    main()
