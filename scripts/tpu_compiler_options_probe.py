"""Does the remote compile helper honor per-jit compiler options?

XLA_FLAGS cannot carry TPU-only flags here (the local CPU client aborts on
unknown flags — results/r2/bench_lhs_flag.log). jax.jit's
`compiler_options` travel inside the compile request instead; if honored,
the latency-hiding scheduler is the one XLA knob round-1 never tested.
Times the bf16 U-Net forward (16x1212) with and without.

Usage: python scripts/tpu_compiler_options_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig
from tpu_unet.models import UNet
from tpu_unet.utils.profiling import measure_roundtrip


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}")
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    model = UNet(ModelConfig(compute_dtype="bfloat16"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 1212, 1212, 1),
                           jnp.float32)

    from jax import lax

    REPS = 4

    def make(opts):
        # compiler_options must sit on the OUTERMOST jit (inner jits inline),
        # so the reps-chain lives inside the optioned program.
        def chain(xx):
            def body(c, _):
                y = model.apply(params, xx + (c * 1e-30).astype(xx.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return s
        return (jax.jit(chain, compiler_options=opts) if opts
                else jax.jit(chain))

    option_sets = [
        ("baseline", None),
        ("latency-hiding", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
        ("dot-fusion", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ]
    import numpy as np
    for name, opts in option_sets:
        try:
            f = make(opts)
            float(f(x))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(x))
                times.append((time.perf_counter() - t0 - rt) / REPS)
            log(f"  {name:16s}: {float(np.median(times))*1e3:8.2f} ms / fwd(b16)")
        except Exception as e:
            log(f"  {name:16s}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
