"""In-program per-stage cost of the inference forward: time jitted prefixes
of the U-Net (stage 1, stages 1-2, ...) and report successive differences.

Unlike isolated per-layer probes (tpu_quant_probe.py section_levels), prefix
diffs keep XLA's in-program layout choices and fusions, so the differences
attribute wall time the way the real forward spends it.

Usage: python scripts/tpu_stack_profile.py [batch] [tile_in]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1212

    from tpu_unet.config import ModelConfig
    from tpu_unet.models import UNet

    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(6):
        float(noop(jnp.int32(0)))
    roundtrip = (time.perf_counter() - t0) / 6
    log(f"roundtrip {roundtrip*1e3:.1f} ms")

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, tile, tile, 1),
                           jnp.float32)

    # Stage list mirrors models/unet.py's forward; `upto` truncates.
    stages = []
    for d in range(4):
        stages += [f"enc{d}_conv1", f"enc{d}_conv2", f"pool{d}"]
    stages += ["bottleneck_conv1", "bottleneck_conv2"]
    for d in reversed(range(4)):
        stages += [f"up{d}+concat", f"dec{d}_conv1", f"dec{d}_conv2"]
    stages += ["head+argmax"]

    from flax import linen as nn

    from tpu_unet.models.unet import center_crop_or_pad

    p = params["params"]

    def conv(v, name):
        k, b = p[name]["kernel"], p[name]["bias"]
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(v, k, (1, 1), "VALID",
                                         dimension_numbers=dn)
        return jnp.maximum(y + b, 0)

    def forward_upto(x, n_stages):
        v = x.astype(jnp.bfloat16)
        skips = []
        i = 0
        for d in range(4):
            for nm in (f"enc{d}_conv1", f"enc{d}_conv2"):
                if i >= n_stages:
                    return v
                v = conv(v, nm)
                i += 1
            if i >= n_stages:
                return v
            skips.append(v)
            v = nn.max_pool(v, (2, 2), strides=(2, 2))
            i += 1
        for nm in ("bottleneck_conv1", "bottleneck_conv2"):
            if i >= n_stages:
                return v
            v = conv(v, nm)
            i += 1
        for d in reversed(range(4)):
            if i >= n_stages:
                return v
            k, b = p[f"up{d}"]["kernel"], p[f"up{d}"]["bias"]
            v = jax.lax.conv_transpose(
                v, k, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            sk = center_crop_or_pad(skips[d], v.shape[1:3])
            v = jnp.concatenate([sk, v], axis=-1)
            i += 1
            for nm in (f"dec{d}_conv1", f"dec{d}_conv2"):
                if i >= n_stages:
                    return v
                v = conv(v, nm)
                i += 1
        if i >= n_stages:
            return v
        k, b = p["head"]["kernel"], p["head"]["bias"]
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        v = jax.lax.conv_general_dilated(v, k, (1, 1), "VALID",
                                         dimension_numbers=dn)
        return jnp.argmax(v, axis=-1).astype(jnp.int8)

    prev = 0.0
    for n_stages in range(1, len(stages) + 1):
        # full in-jit sum: sliced readbacks would let XLA narrow the last
        # stage; host-side casts would add output-sized copies to the timing
        f = jax.jit(lambda x, n=n_stages:
                    jnp.sum(forward_upto(x, n)).astype(jnp.float32))
        float(f(x))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            times.append(time.perf_counter() - t0 - roundtrip)
        dt = float(np.median(times))
        log(f"  upto {n_stages:2d} ({stages[n_stages-1]:17s}): "
            f"{dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms)")
        prev = dt
    log("done")


if __name__ == "__main__":
    main()
