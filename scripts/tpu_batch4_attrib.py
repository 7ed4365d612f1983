"""Batch-4 train pathology attribution (VERDICT r4 item 7) — ONE session.

results/r4/train_batch_sweep.txt: the production phase-packed fused step
costs 23.2 ms/sample at batch 2, 26.9 at batch 4 (WORSE per sample — a
2.3x step-cost cliff for 2x the work), then 14.8 at batch 8. Which stage
regresses? This script times each component separately at batch 2/4/8 in
one chip window, per-sample numbers alongside:

  augment        on-device crop+rotate+elastic pipeline (pipe._fn)
  weights        CC+EDT distance weight maps on the batch of targets
  forward        model.apply (phase-packed, bf16)
  fwd+bwd        loss + full parameter backward (jax.grad)
  step           the fused train step as composed (fwd+bwd+weights+SGD)

Methodology: utils.profiling.timeit_readback (adaptive reps, roundtrip
subtracted, every output leaf consumed so nothing is DCE'd — the r3
lesson). A batch-2 stage is re-timed at the session tail to bound drift.

Usage: timeout 3600 python scripts/tpu_batch4_attrib.py [--batches 2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4,8")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--base-width", type=int, default=64)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses import weighted_bce_with_logits
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.models.unet import center_crop_or_pad
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    cfg = ModelConfig(base_width=args.base_width, compute_dtype="bfloat16",
                      phase_level0=True)
    model = UNet(cfg)
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, weight_fn, "intended", tx)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    key = jax.random.PRNGKey(1)

    def loss_of(p, i, g, w):
        logits = center_crop_or_pad(model.apply(p, i), g.shape[1:3])
        return weighted_bce_with_logits(logits, g, w, "intended")

    wgrad = jax.jit(lambda i, p, g, w: jax.grad(
        lambda pp: loss_of(pp, i, g, w))(p))

    rows = []  # (batch, stage, ms, ms_per_sample)

    def t(batch, label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  b{batch} {label:10s}: {d*1e3:8.2f} ms  "
                f"{d*1e3/batch:7.2f} ms/sample")
            rows.append((batch, label, d * 1e3, d * 1e3 / batch))
        except Exception as e:
            log(f"  b{batch} {label:10s}: FAILED {type(e).__name__}: "
                f"{str(e)[:150]}")
            rows.append((batch, label, None, None))

    def run_batch(batch, tag=""):
        log(f"-- batch {batch}{tag} --")
        idx = jnp.asarray(np.arange(batch) % images.shape[0], jnp.int32)
        t(batch, "augment",
          lambda k: pipe._fn(images, targets, lp, pairs, idx, k), key)
        inp, gt = pipe._fn(images, targets, lp, pairs, idx, key)
        float(jnp.sum(inp))
        t(batch, "weights", lambda g: weight_fn(g), gt)
        wts = weight_fn(gt)
        float(jnp.sum(wts))
        fwd = jax.jit(lambda i, p: model.apply(p, i))
        t(batch, "forward", fwd, inp, state.params)
        t(batch, "fwd+bwd", wgrad, inp, state.params, gt, wts)
        # full output tuple returned: the timer consumes every leaf, so the
        # backward+SGD cannot be DCE'd out of the timed graph
        t(batch, "step", lambda i, g: step(state, i, g), inp, gt)

    for b in batches:
        run_batch(b)
    # drift bound at the session tail
    run_batch(batches[0], tag=" (repeat, drift bound)")

    print("\nbatch  stage       ms        ms/sample")
    for b, label, ms, msps in rows:
        if ms is None:
            print(f"{b:>5}  {label:10s}  FAILED")
        else:
            print(f"{b:>5}  {label:10s}  {ms:8.2f}  {msps:8.2f}")


if __name__ == "__main__":
    main()
