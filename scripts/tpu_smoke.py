"""Real-TPU smoke test for the Pallas kernels (interpret mode can pass where
Mosaic lowering fails — e.g. f32 iota — so every kernel must also compile and
run on the actual chip).

Checks: EDT column pass (incl. under vmap, as the train step uses it),
fused conv3x3+bias+relu vs the XLA path, and a weighted_map end-to-end.
Prints PASS/FAIL per kernel + a conv timing comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float32)))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print("establishing session ...", flush=True)
    float(jnp.zeros(()).sum())

    from tpu_unet.ops.edt import edt_batch
    from tpu_unet.losses.weights import weighted_map
    from tpu_unet.ops.conv_pallas import conv3x3_bias_relu, conv3x3_bias_relu_xla

    rng = np.random.RandomState(0)

    # --- EDT pallas vs scan on chip ---
    masks = np.zeros((4, 196, 196), bool)
    yy, xx = np.mgrid[0:196, 0:196]
    for i in range(4):
        cy, cx = rng.randint(20, 176, 2)
        masks[i] = (yy - cy) ** 2 + (xx - cx) ** 2 <= 100
    m = jnp.asarray(masks)
    a = jax.jit(lambda m: edt_batch(m, use_pallas=True))(m)
    b = jax.jit(lambda m: edt_batch(m, use_pallas=False))(m)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"EDT pallas vs scan max err: {err:.2e} "
          f"{'PASS' if err < 1e-3 else 'FAIL'}", flush=True)

    # --- EDT under vmap (weighted_map path) ---
    gt = jnp.asarray((masks[:2]).astype(np.int32))
    w = jax.jit(lambda g: weighted_map(g, max_objects=8))(gt)
    ok = bool(jnp.all(jnp.isfinite(w))) and float(w.max()) > 1.0
    print(f"weighted_map on TPU: max={float(w.max()):.3f} "
          f"{'PASS' if ok else 'FAIL'}", flush=True)

    # --- Pallas conv vs XLA on chip, correctness + timing ---
    for (b_, h, cin, cout) in [(8, 178, 64, 64), (8, 90, 128, 128),
                               (8, 48, 256, 256)]:
        x = jnp.asarray(rng.randn(b_, h, h, cin), jnp.bfloat16)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(cout) * 0.05, jnp.bfloat16)
        f_p = jax.jit(lambda x, w, b: conv3x3_bias_relu(x, w, b))
        f_x = jax.jit(lambda x, w, b: conv3x3_bias_relu_xla(x, w, b))
        try:
            yp = f_p(x, wk, bias)
            yx = f_x(x, wk, bias)
            err = float(jnp.max(jnp.abs(yp.astype(jnp.float32)
                                        - yx.astype(jnp.float32))))
            # timing: chained loop
            def timeit(f):
                sync(f(x, wk, bias))
                t0 = time.perf_counter()
                for _ in range(10):
                    sync(f(x, wk, bias))
                return (time.perf_counter() - t0) / 10
            tp, tx_ = timeit(f_p), timeit(f_x)
            print(f"conv {b_}x{h}x{cin}->{cout}: err={err:.3f} "
                  f"pallas {tp*1e3:.1f}ms xla {tx_*1e3:.1f}ms "
                  f"{'PASS' if err < 0.5 else 'FAIL'}", flush=True)
        except Exception as e:
            print(f"conv {b_}x{h}x{cin}->{cout}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
