"""Engine-level TILED serving at production image sizes — ONE session.

The r5 e2e probes measured the engine on 512² images (single-tile
whole-image mode, the reference's data scale). This measures the full
overlap-tile journey — pad → aligned tile grid → quantized forward →
stitch → argmax → metrics, one fused dispatch per image batch — on 2048²
images through the headline 1268-out tile (4 tiles/image, pooling-aligned
origins after the r5 geometry fix), with the eval set device-resident
(pinned steady state). Useful output counted in 512² tile units:
one 2048² image = 16 units.

Usage: timeout 2400 python scripts/tpu_engine_tiled.py [--n 4] [--cpu]
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
    ap.add_argument("--tiles", default="1268,1028")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--base-width", type=int, default=64)
    ap.add_argument("--out", default="results/r5/engine_tiled.json")
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
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    cfg = ModelConfig(base_width=args.base_width, compute_dtype="bfloat16")
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (2, 444, 444, 1),
                               jnp.float32)
    log("calibrating + quantizing (phase-int8) ...")
    qi = build_quant_inference(model, params, calib, min_channels=128,
                               phase_level0="int8")

    s = args.size
    units_per_image = (s / 512.0) ** 2
    rng = np.random.RandomState(0)
    imgs = rng.rand(args.n, s, s).astype(np.float32)
    labels = (rng.rand(args.n, s, s) > 0.5).astype(np.uint8)
    imgs_dev = jnp.asarray(imgs)
    labels_dev = jnp.asarray(labels)
    float(jnp.sum(labels_dev) + jnp.sum(imgs_dev[0, 0]))
    rec = {"n_images": args.n, "image_size": s,
           "roundtrip_ms": round(rt * 1e3, 1)}

    # same-window kernel anchor at the headline shape
    try:
        t1268 = jax.random.uniform(jax.random.PRNGKey(3),
                                   (16, 1452, 1452, 1), jnp.float32)
        d = timeit_readback(lambda t: qi.apply(t), t1268)
        k = 16 * (1268.0 ** 2 / 512.0 ** 2) / d
        rec["kernel_1268_tiles_s"] = round(k, 1)
        log(f"kernel anchor 16x1452^2: {d*1e3:.1f} ms -> {k:.1f} tiles/s")
        del t1268
    except Exception as e:
        log(f"kernel anchor failed: {type(e).__name__}: {str(e)[:160]}")

    for tout in [int(t) for t in args.tiles.split(",")]:
        eng = TileInference(model, s, s, tile_out=tout, batch_tiles=4,
                            apply_fn=lambda p, t: qi.apply(t))
        plan = eng.plan
        log(f"tile_out={tout}: {plan.num_tiles} tiles/image, origins "
            f"{[o for o, _ in plan.out_origins][:4]}..., canvas "
            f"{plan.canvas_h}")
        try:
            log(f"  compiling fused evaluate_batch "
                f"({args.n} x {s}^2, {tout}-out tiles) ...")
            t0 = time.perf_counter()
            ms_dev, _preds = eng.evaluate_batch(params, imgs_dev, labels_dev)
            np.asarray(ms_dev)
            log(f"  compile+first call {time.perf_counter() - t0:.1f}s")
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                ms_dev, _preds = eng.evaluate_batch(params, imgs_dev,
                                                    labels_dev)
                np.asarray(ms_dev)
                walls.append(time.perf_counter() - t0)
            wall = float(np.median(walls))
            tps = args.n * units_per_image / max(wall - rt, 1e-9)
            rec[f"engine_tiled_{tout}_s"] = round(wall, 3)
            rec[f"engine_tiled_{tout}_tiles_s"] = round(tps, 1)
            log(f"  warm fused journey: {wall*1e3:.0f} ms for {args.n} "
                f"images ({args.n * units_per_image:.0f} tile units) -> "
                f"{tps:.1f} 512^2-tiles/s engine-level")
        except Exception as e:
            log(f"  tile_out={tout} failed: {type(e).__name__}: "
                f"{str(e)[:200]}")
            rec[f"engine_tiled_{tout}_error"] = str(e)[:200]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
