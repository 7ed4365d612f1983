"""Cumulative-cutoff stage profile of the int8 serving forward.

Times the quantized forward truncated after each stage (QuantInference.apply
`stop_after`) at the serving shape; successive differences attribute
wall-clock to stages *as composed* (XLA fusion boundaries included), which a
per-layer microbench cannot. Readback-based timing (utils/profiling).

Usage: python scripts/tpu_stage_profile.py [batch] [tile_in]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig
from tpu_unet.infer.quant import build_quant_inference
from tpu_unet.models import UNet
from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


STAGES = [
    "enc0_conv1", "enc0_conv2", "pool0",
    "enc1_conv1", "enc1_conv2", "pool1",
    "enc2_conv2", "pool2", "enc3_conv2", "pool3",
    "bottleneck_conv2",
    "up3", "dec3_conv2", "up2", "dec2_conv2",
    "up1", "dec1_conv1", "dec1_conv2",
    "up0", "dec0_conv1", "dec0_conv2",
    None,            # full forward incl. head
]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tile_in = int(sys.argv[2]) if len(sys.argv) > 2 else 1212
    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    log(f"device: {jax.devices()[0]}, batch {batch}, tile_in {tile_in}")
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (2, 444, 444, 1))
    qi = build_quant_inference(model, params, calib, min_channels=128)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (batch, tile_in, tile_in, 1), jnp.float32)

    prev = 0.0
    for st in STAGES:
        label = st or "full(+head+deq)"
        try:
            d = timeit_readback(
                lambda xx, _=None, st=st: qi.apply(xx, stop_after=st), x)
        except Exception as e:
            log(f"  {label:20s}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:90]}")
            continue
        log(f"  {label:20s}: cum {d*1e3:8.2f} ms   stage {((d - prev))*1e3:+8.2f} ms")
        prev = d
    log("done")


if __name__ == "__main__":
    main()
