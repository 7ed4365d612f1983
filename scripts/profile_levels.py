"""Per-level conv timing on the TPU: times each U-Net stage's double-conv at
its inference shapes (bf16, configurable batch) to locate utilization loss.

Usage: python scripts/profile_levels.py [batch] [tile_in]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tile_in = int(sys.argv[2]) if len(sys.argv) > 2 else 700
    widths = [64, 128, 256, 512, 1024]
    rng = jax.random.PRNGKey(0)

    s = tile_in
    cin = 1
    print(f"batch={b} tile_in={tile_in}", flush=True)
    for d in range(5):
        w1 = jax.random.normal(rng, (3, 3, cin, widths[d]), jnp.bfloat16)
        w2 = jax.random.normal(rng, (3, 3, widths[d], widths[d]), jnp.bfloat16)
        x = jax.random.normal(rng, (b, s, s, cin), jnp.bfloat16)
        dn = lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def block(x, w1=w1, w2=w2, dn=dn):
            y = jnp.maximum(lax.conv_general_dilated(
                x, w1, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.float32), 0).astype(jnp.bfloat16)
            y = jnp.maximum(lax.conv_general_dilated(
                y, w2, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.float32), 0).astype(jnp.bfloat16)
            return y

        # output shape differs from input, so no scan chaining; per-call
        # timings below include the ~30 ms tunnel roundtrip each.
        y = block(x)
        float(jnp.sum(y.astype(jnp.float32)[0, 0, 0]))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(jnp.sum(block(x).astype(jnp.float32)[0, 0, 0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        gf = (2 * 9 * cin * widths[d] * b * (s - 2) ** 2
              + 2 * 9 * widths[d] ** 2 * b * (s - 4) ** 2) / 1e9
        print(f"enc{d}: {s}x{s} cin={cin:4d} cout={widths[d]:4d} "
              f"{dt*1e3:7.1f} ms  {gf:8.1f} GF  {gf/dt/1e3:6.1f} TF/s "
              f"(incl ~30ms roundtrip)", flush=True)
        s = (s - 4) // 2
        cin = widths[d]


if __name__ == "__main__":
    main()
