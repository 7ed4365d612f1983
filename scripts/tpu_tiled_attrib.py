"""Attribute the tiled-engine gap (results/r5/engine_tiled.txt: 187.4
engine-level vs ~430 kernel anchor) — ONE session, three jitted variants at
identical shapes (4x 2048² images, 1028-out tiles => 16 tiles of 1212²):

  A. forward-only: qi.apply + argmax over PRE-GATHERED tiles
     [4,4,1212,1212,1] (the kernel rate at this tile shape, vmapped exactly
     like the engine runs it)
  B. pad + gather + forward + argmax (no stitch, no metrics): the engine's
     front half from pinned full images
  C. the full fused evaluate_batch (pad/gather/forward/stitch/argmax/
     metrics) — the measured 187.4 configuration

A-vs-kernel-anchor isolates the vmap/fusion cost of the engine graph;
B-A isolates pad+gather; C-B isolates stitch+argmax+metrics.

Usage: timeout 2400 python scripts/tpu_tiled_attrib.py [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=1028)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--base-width", type=int, default=64)
    ap.add_argument("--out", default="results/r5/tiled_attrib.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpu_unet.config import ModelConfig
    from tpu_unet.infer.quant import build_quant_inference
    from tpu_unet.infer.tiles import TileInference
    from tpu_unet.models import UNet
    from tpu_unet.ops.pad import reflect_pad
    from tpu_unet.utils.profiling import measure_roundtrip

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    model = UNet(ModelConfig(base_width=args.base_width,
                             compute_dtype="bfloat16"))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (2, 444, 444, 1),
                               jnp.float32)
    log("calibrating + quantizing (phase-int8) ...")
    qi = build_quant_inference(model, params, calib, min_channels=128,
                               phase_level0="int8")

    s = args.size
    rng = np.random.RandomState(0)
    imgs_dev = jnp.asarray(rng.rand(args.n, s, s).astype(np.float32))
    labels_dev = jnp.asarray((rng.rand(args.n, s, s) > 0.5
                              ).astype(np.uint8))
    float(jnp.sum(labels_dev) + jnp.sum(imgs_dev[0, 0]))

    eng = TileInference(model, s, s, tile_out=args.tile, batch_tiles=4,
                        apply_fn=lambda p, t: qi.apply(t))
    plan = eng.plan
    units = args.n * (s / 512.0) ** 2
    rec = {"n": args.n, "size": s, "tile": args.tile,
           "roundtrip_ms": round(rt * 1e3, 1),
           "tiles_per_image": plan.num_tiles}

    def timed(tag, fn, *a):
        t0 = time.perf_counter()
        float(fn(*a))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*a))
            walls.append(time.perf_counter() - t0)
        wall = max(float(np.median(walls)) - rt, 1e-9)
        tps = units / wall
        rec[f"{tag}_s"] = round(wall, 3)
        rec[f"{tag}_tiles_s"] = round(tps, 1)
        log(f"  {tag}: {wall*1e3:.0f} ms ({compile_s:.1f}s compile+first) "
            f"-> {tps:.1f} tiles/s")
        return wall

    ti = plan.tile_in if isinstance(plan.tile_in, int) else plan.tile_in[0]

    # A. forward-only over pre-gathered tiles
    tiles_dev = jax.random.uniform(
        jax.random.PRNGKey(3), (args.n, plan.num_tiles, ti, ti, 1),
        jnp.float32)
    float(jnp.sum(tiles_dev[0, 0, 0, 0]))

    @jax.jit
    def fwd_only(tiles):
        def per_image(t):
            return jnp.sum(jnp.argmax(qi.apply(t), axis=-1),
                           dtype=jnp.int32)

        return jnp.sum(jax.vmap(per_image)(tiles))

    log(f"A: forward-only, {args.n}x{plan.num_tiles} tiles of {ti}^2 ...")
    timed("A_forward_only", fwd_only, tiles_dev)

    # B. pad + gather + forward + argmax (no stitch/metrics)
    @jax.jit
    def front_half(images):
        def per_image(image):
            image = (image - jnp.min(image)) / jnp.maximum(jnp.ptp(image),
                                                           1e-12)
            padded = reflect_pad(
                image, ((plan.pad, plan.pad + plan.canvas_h - plan.image_h),
                        (plan.pad, plan.pad + plan.canvas_w - plan.image_w)))
            tiles = jnp.stack([padded[y:y + ti, x:x + ti]
                               for (y, x) in plan.origins])[..., None]
            return jnp.sum(jnp.argmax(qi.apply(tiles), axis=-1),
                           dtype=jnp.int32)

        return jnp.sum(jax.vmap(per_image)(images))

    log("B: pad+gather+forward+argmax (no stitch) ...")
    timed("B_front_half", front_half, imgs_dev)

    # C. the full fused journey (stitch + metrics included)
    def full(images, labels):
        ms, _ = eng.evaluate_batch(params, images, labels)
        return jnp.sum(ms)

    log("C: full evaluate_batch ...")
    timed("C_full_journey", full, imgs_dev, labels_dev)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
