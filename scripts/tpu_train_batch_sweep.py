"""Train batch-scaling record (VERDICT r3 item 4), ONE TPU session.

The reference trains at batch 2 (`/root/reference/main_main.py:136`) — a
reference constant, not a TPU optimum. This sweep measures the production
fused train step (on-device augment + CC/EDT distance weights + backward +
SGD, phase-packed level 0, 572-in/388-out) at batch 2/4/8/16 in one session,
then RE-measures batch 2 at the end so within-session drift is bounded by
the first-vs-last batch-2 delta. A width_mult=2 arm (BASELINE config 5, the
2x-wide variant) rides the same session.

Methodology per results/r3 lessons: whole-epoch lax.scan engine (host
per-step loops measure the tunnel, not the chip), scalar-readback sync,
median of 3 timed epochs after warmup, tunnel roundtrip subtracted.

Usage:  timeout 3600 python scripts/tpu_train_batch_sweep.py \
            [--batches 2,4,8,16] [--iters 10] [--out results/r4/...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8,16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-wide", action="store_true")
    ap.add_argument("--out", default="results/r4/train_batch_sweep.txt")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from tpu_unet.config import (AugmentConfig, LossConfig, ModelConfig,
                                 OptimConfig)
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step

    log(f"devices: {jax.devices()}")
    log("establishing TPU session ...")
    t0 = time.perf_counter()
    float(jnp.zeros(()).sum())
    log(f"session up in {time.perf_counter() - t0:.1f}s")

    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    key0 = jax.random.PRNGKey(1)
    n = args.iters

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(jnp.int32(0)))
    roundtrip = (time.perf_counter() - t0) / 5
    log(f"tunnel roundtrip {roundtrip * 1e3:.1f} ms (subtracted)")

    results = []  # (tag, batch, ms_per_step, steps_s, samples_s) or error

    def measure(tag, batch, width_mult=1):
        cfg = ModelConfig(width_mult=width_mult, compute_dtype="bfloat16",
                          phase_level0=True)
        model = UNet(cfg)
        step = make_train_step(model, weight_fn, "intended", tx)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 188, 188, 1)))
        state = TrainState(params, tx.init(params))
        indices = jnp.asarray(np.arange(batch) % images.shape[0], jnp.int32)

        @jax.jit
        def run_n(state, keys):
            def body(st, key):
                inp, gt = pipe._fn(images, targets, lp, pairs, indices, key)
                st, loss, metrics = step(st, inp, gt)
                return st, loss

            return jax.lax.scan(body, state, keys)

        keys = jax.vmap(lambda i: jax.random.fold_in(key0, i))(jnp.arange(n))
        log(f"[{tag}] compiling (batch {batch}, width {width_mult}) ...")
        t0 = time.perf_counter()
        state, losses = run_n(state, keys)
        float(losses[-1])
        log(f"[{tag}] compile+first epoch {time.perf_counter() - t0:.1f}s")
        float(losses[-1])  # warmup epoch already above; one more timed warmup
        state, losses = run_n(state, keys)
        float(losses[-1])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = run_n(state, keys)
            float(losses[-1])
            times.append(time.perf_counter() - t0 - roundtrip)
        dt = float(np.median(times)) / n
        sps = 1.0 / dt
        log(f"[{tag}] {dt * 1e3:.2f} ms/step -> {sps:.2f} steps/s, "
            f"{sps * batch:.2f} samples/s")
        results.append((tag, batch, dt * 1e3, sps, sps * batch))
        # release this config's state before the next (bigger) one compiles
        del state, losses, params, keys
        return

    for b in batches:
        tag = f"b{b}"
        try:
            measure(tag, b)
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}")
            results.append((tag, b, None, None, None))
    if not args.skip_wide:
        try:
            measure("b2-wide2", 2, width_mult=2)
        except Exception as e:
            log(f"[b2-wide2] FAILED: {type(e).__name__}: {str(e)[:300]}")
            results.append(("b2-wide2", 2, None, None, None))
    # drift bound: batch 2 again, same session tail
    try:
        measure("b2-repeat", batches[0])
    except Exception as e:
        log(f"[b2-repeat] FAILED: {type(e).__name__}: {str(e)[:300]}")

    lines = ["tag        batch  ms/step   steps/s  samples/s"]
    for tag, b, ms, sps, smps in results:
        if ms is None:
            lines.append(f"{tag:<10} {b:>5}  FAILED")
        else:
            lines.append(
                f"{tag:<10} {b:>5}  {ms:7.2f}  {sps:7.2f}  {smps:9.2f}")
    table = "\n".join(lines)
    print(table)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Production phase-packed fused train step, 572-in/388-out,"
                " one TPU session\n")
        f.write(f"# roundtrip {roundtrip * 1e3:.1f} ms; iters/epoch {n}; "
                f"median of 3 epochs\n")
        f.write(table + "\n")
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
