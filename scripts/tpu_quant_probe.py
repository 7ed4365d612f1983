"""Round-2 TPU probe: per-layer conv timings (bf16 XLA vs int8 XLA vs fused
Pallas int8/bf16), upconv alternatives, and end-to-end quantized forward.

One process, one TPU session; prints timing lines to stdout. Timing uses
dependency-chained repeats inside one jit where possible, else per-call with
tunnel-roundtrip subtraction (CLAUDE.md: block_until_ready is a no-op here).

Usage: python scripts/tpu_quant_probe.py [section ...]
  sections: levels int8xla pallas upconv e2e argmax  (default: all)
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


ROUNDTRIP = None


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


def timeit(fn, *args, n=4, reps=8, chain_arg=None):
    """Median per-op seconds: `reps` dependency-chained invocations of fn
    inside ONE jit, so ops far below the ~35 ms tunnel roundtrip resolve.

    Chain: a traced epsilon (always 0/denormal at runtime) derived from the
    previous rep's full output sum is added to args[chain_arg] (default: the
    last small arg — weights — to keep the perturbation pass cheap). The full
    sum also blocks XLA from narrowing the op to a sliced readback. Overhead
    per rep = one perturb-add of the chained arg + one read of the output.

    (probe1.log used host-side readbacks — output-sized copies per call;
    probe2.log's first section used per-call timing — sub-roundtrip ops came
    out negative. This is the third and correct harness.)"""
    ci = chain_arg if chain_arg is not None else (1 if len(args) > 1 else 0)

    @jax.jit
    def run(*a):
        def body(c, _):
            aa = list(a)
            aa[ci] = aa[ci] + (c * 1e-30).astype(aa[ci].dtype)
            y = fn(*aa)
            return jnp.sum(y).astype(jnp.float32) * 1e-30, None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return s

    float(run(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0 - ROUNDTRIP) / reps)
    return float(np.median(times))


# (name, s_in, cin, cout) at tile_in=1212 inference shapes.
def level_shapes(tile=1212):
    s = tile
    shapes = [("enc0_conv1", s, 1, 64), ("enc0_conv2", s - 2, 64, 64)]
    s = (s - 4) // 2
    for d, w in ((1, 128), (2, 256), (3, 512)):
        shapes += [(f"enc{d}_conv1", s, w // 2, w),
                   (f"enc{d}_conv2", s - 2, w, w)]
        s = (s - 4) // 2
    shapes += [("bott_conv1", s, 512, 1024), ("bott_conv2", s - 2, 1024, 1024)]
    s = s - 4
    for d, w in ((3, 512), (2, 256), (1, 128), (0, 64)):
        s = s * 2
        shapes += [(f"dec{d}_conv1", s, 2 * w, w),
                   (f"dec{d}_conv2", s - 2, w, w)]
        s = s - 4
    return shapes


def conv_bf16(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)


def conv_int8(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)


def gflops(b, s, cin, cout):
    return 2 * 9 * cin * cout * b * (s - 2) ** 2 / 1e9


def section_levels(batch):
    log(f"== per-level conv timings, batch={batch}, bf16 XLA ==")
    rng = jax.random.PRNGKey(0)
    for name, s, cin, cout in level_shapes():
        try:
            x = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
            w = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16)
            f = jax.jit(conv_bf16)
            dt = timeit(f, x, w)
            gf = gflops(batch, s, cin, cout)
            log(f"  {name:12s} {s:5d}^2 {cin:4d}->{cout:4d}  {dt*1e3:8.1f} ms "
                f"{gf:9.1f} GF  {gf/dt/1e3:6.1f} TF/s")
            del x, w
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:150]}")


def section_int8xla(batch):
    log(f"== per-level conv timings, batch={batch}, int8 XLA ==")
    rng = jax.random.PRNGKey(0)
    for name, s, cin, cout in level_shapes():
        if cin < 64:
            continue
        try:
            x = jax.random.randint(rng, (batch, s, s, cin), -127, 128, jnp.int8)
            w = jax.random.randint(rng, (3, 3, cin, cout), -127, 128, jnp.int8)
            f = jax.jit(conv_int8)
            dt = timeit(f, x, w)
            gf = gflops(batch, s, cin, cout)
            log(f"  {name:12s} {s:5d}^2 {cin:4d}->{cout:4d}  {dt*1e3:8.1f} ms "
                f"{gf:9.1f} GF  {gf/dt/1e3:6.1f} TOP/s")
            del x, w
        except Exception as e:
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:150]}")


PALLAS_SHAPES = {  # representative: one per (channel regime x spatial regime)
    "enc0_conv2", "enc1_conv2", "enc2_conv2", "bott_conv2",
    "dec3_conv1", "dec1_conv1", "dec0_conv1", "dec0_conv2",
}


def section_pallas(batch):
    from tpu_unet.ops.conv_tiles import conv3x3_fused

    log(f"== fused Pallas conv, batch={batch} (int8 and bf16) ==")
    rng = jax.random.PRNGKey(0)
    for name, s, cin, cout in level_shapes():
        if cin < 64 or name not in PALLAS_SHAPES:
            continue
        for kind in ("int8", "bf16"):
            best = None
            for variant in ("nconcat", "taps"):
                for br in (8, 16):
                    ct = min(cout, 256)
                    for attempt in (1, 2):  # the compile helper is flaky
                        try:
                            if kind == "int8":
                                x = jax.random.randint(rng, (batch, s, s, cin),
                                                       -127, 128, jnp.int8)
                                w = jax.random.randint(rng, (3, 3, cin, cout),
                                                       -127, 128, jnp.int8)
                            else:
                                x = jax.random.normal(rng, (batch, s, s, cin),
                                                      jnp.bfloat16)
                                w = jax.random.normal(rng, (3, 3, cin, cout),
                                                      jnp.bfloat16)
                            a = jnp.full((cout,), 1e-3, jnp.float32)
                            b = jnp.zeros((cout,), jnp.float32)
                            f = jax.jit(lambda x, w, a, b, br=br, ct=ct,
                                        v=variant:
                                        conv3x3_fused(x, w, a, b,
                                                      block_rows=br,
                                                      cout_tile=ct, variant=v))
                            dt = timeit(f, x, w, a, b, n=4)
                            log(f"    {name} {kind} {variant} br={br}: "
                                f"{dt*1e3:.1f} ms")
                            if best is None or dt < best[0]:
                                best = (dt, br, ct, variant)
                            del x, w
                            break
                        except Exception as e:
                            log(f"  {name} {kind} {variant} br={br} "
                                f"attempt {attempt}: FAILED "
                                f"{type(e).__name__}: {str(e)[:100]}")
            if best:
                dt, br, ct, variant = best
                gf = gflops(batch, s, cin, cout)
                log(f"  {name:12s} {kind} {s:5d}^2 {cin:4d}->{cout:4d}  "
                    f"{dt*1e3:8.1f} ms  {gf/dt/1e3:6.1f} T/s  "
                    f"(br={br} ct={ct} {variant})")


def section_upconv(batch):
    log(f"== upconv: conv_transpose vs matmul+depth-to-space, batch={batch} ==")
    rng = jax.random.PRNGKey(0)
    # (s_in, cin, cout) decoder upconv shapes at tile 1212
    for s, cin, cout in ((68, 1024, 512), (132, 512, 256), (260, 256, 128),
                         (516, 128, 64)):
        x = jax.random.normal(rng, (batch, s, s, cin), jnp.bfloat16)
        w = jax.random.normal(rng, (2, 2, cin, cout), jnp.bfloat16)

        @jax.jit
        def tconv(x, w):
            return lax.conv_transpose(
                x, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def mm(x, w):
            b, h, wd, ci = x.shape
            co = w.shape[-1]
            wr = w.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
            y = jnp.dot(x.reshape(-1, ci), wr,
                        preferred_element_type=jnp.float32)
            y = y.reshape(b, h, wd, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, 2 * h, 2 * wd, co).astype(jnp.bfloat16)

        ref = np.asarray(tconv(x, w), np.float32)
        got = np.asarray(mm(x, w), np.float32)
        err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
        dt1, dt2 = timeit(tconv, x, w), timeit(mm, x, w)
        gf = 2 * 4 * cin * cout * batch * s * s / 1e9
        log(f"  up {s:4d}^2 {cin:4d}->{cout:4d}: tconv {dt1*1e3:7.1f} ms "
            f"({gf/dt1/1e3:5.1f} TF/s)  mm+d2s {dt2*1e3:7.1f} ms "
            f"({gf/dt2/1e3:5.1f} TF/s)  relerr {err:.2e}")
        del x, w


def section_peak(batch):
    """Raw MXU ceilings: chained 4096^3 matmuls in bf16 and int8."""
    log("== peak matmul: bf16 vs int8 (chained 8192^3) ==")
    n = 8192  # long matmuls amortize the per-iter clip/cast repack
    xb = jnp.full((n, n), 1.0 / n, jnp.bfloat16)   # self-stable chain
    xi = jnp.ones((n, n), jnp.int8)

    @jax.jit
    def chain_bf16(a):
        def body(c, _):
            return (c @ c).astype(jnp.bfloat16), None
        y, _ = lax.scan(body, a, None, length=20)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def chain_int8(a):
        def body(c, _):
            y = lax.dot(c, c, preferred_element_type=jnp.int32)
            # keep values at 1 so the chain neither overflows nor folds
            return jnp.clip(y, -1, 1).astype(jnp.int8), None
        y, _ = lax.scan(body, a, None, length=20)
        return jnp.sum(y.astype(jnp.float32))

    for name, f, x in (("bf16", chain_bf16, xb), ("int8", chain_int8, xi)):
        float(f(x))
        t0 = time.perf_counter()
        float(f(x))
        dt = time.perf_counter() - t0 - ROUNDTRIP
        log(f"  {name}: {20 * 2 * n ** 3 / dt / 1e12:6.1f} T/s")


def section_argmax(batch):
    log(f"== head output handling at [batch,1028,1028,2] ==")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 1028, 1028, 2), jnp.float32)

    @jax.jit
    def am(x):
        return jnp.argmax(x, axis=-1).astype(jnp.int8)

    @jax.jit
    def cmp(x):
        return (x[..., 1] > x[..., 0]).astype(jnp.int8)

    log(f"  argmax {timeit(am, x)*1e3:7.1f} ms   compare "
        f"{timeit(cmp, x)*1e3:7.1f} ms")


def section_e2e(batch, tile=1212):
    log(f"== end-to-end forward, batch={batch}, tile_in={tile} ==")
    from tpu_unet.config import ModelConfig
    from tpu_unet.infer.quant import build_quant_inference
    from tpu_unet.models import UNet

    model = UNet(ModelConfig(compute_dtype="bfloat16"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, tile, tile, 1),
                           jnp.float32)
    flop = 1.5e6 * batch * (tile - 184) ** 2  # ~1.5 MFLOP/out px

    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda x: jnp.argmax(model.apply(bparams, x), axis=-1))
    dt = timeit(fwd, x, n=5)
    tps = batch * ((tile - 184) / 512.0) ** 2 / dt
    log(f"  bf16 XLA      : {dt*1e3:8.1f} ms  {flop/dt/1e12:5.1f} TF/s  "
        f"{tps:6.1f} tiles/s")

    calib = jax.random.uniform(jax.random.PRNGKey(2), (2, 444, 444, 1),
                               jnp.float32)
    for impl, min_ch in (("xla", 128), ("xla", 64), ("xla", 256),
                         ("pallas", 128), ("pallas", 256)):
        try:
            qi = build_quant_inference(model, params, calib, impl=impl,
                                       min_channels=min_ch, interpret=False)
            qfwd = jax.jit(lambda x: jnp.argmax(qi.apply(x), axis=-1))
            dt = timeit(qfwd, x, n=5)
            tps = batch * ((tile - 184) / 512.0) ** 2 / dt
            log(f"  int8 {impl:7s} min_ch={min_ch:3d}: {dt*1e3:8.1f} ms  "
                f"{flop/dt/1e12:5.1f} TF/s  {tps:6.1f} tiles/s")
        except Exception as e:
            log(f"  int8 {impl} min_ch={min_ch}: FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")


def main():
    sections = sys.argv[1:] or ["levels", "int8xla", "upconv", "argmax",
                                "pallas", "e2e"]
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}")
    measure_roundtrip()
    batch = 8
    for s in sections:
        {"levels": section_levels, "int8xla": section_int8xla,
         "pallas": section_pallas, "upconv": section_upconv,
         "argmax": section_argmax, "peak": section_peak,
         "e2e": lambda b: section_e2e(16)}[s](batch)
    log("done")


if __name__ == "__main__":
    main()
