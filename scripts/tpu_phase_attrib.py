"""Full-graph cost attribution for the PHASE-PACKED train step (round 3).

`phase_train_ab.txt` made phase-packed training the production default
(21.43 vs 15.19 steps/s) but the honest component attribution
(results/r3/train_profile3.txt) was measured on the PLAIN model — the
46.7 ms phase step's cost layout is unknown. This script re-runs the
attribution with ModelConfig.phase_level0=True so the next optimization
target is picked from the workload that actually ships:

  augment      crop+rotate+elastic gathers (batch 2, 572-in)
  weights      CC + banded EDT maps (388^2 x 2)
  fwd+loss     phase-packed forward + weighted BCE
  dgrad        input-gradient chain
  wgrad G      per-group full-graph deltas ('all' - 'all minus G')
  full step    the fused step incl. SGD + metrics
  scan epoch   per-step of the scanned-epoch engine (the bench workload)

plus a plain-model scanned epoch as the chip-window control (healthy
reference ~65.9 ms/step, results/r3/phase_train_ab.txt).

Usage: python scripts/tpu_phase_attrib.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


GROUPS = {
    "enc0": ("enc0_conv1", "enc0_conv2"),
    "enc1": ("enc1_conv1", "enc1_conv2"),
    "mid": ("enc2_conv1", "enc2_conv2", "enc3_conv1", "enc3_conv2",
            "bottleneck_conv1", "bottleneck_conv2", "dec3_conv1",
            "dec3_conv2", "dec2_conv1", "dec2_conv2"),
    "ups": ("up0", "up1", "up2", "up3"),
    "dec1": ("dec1_conv1", "dec1_conv2"),
    "dec0": ("dec0_conv1", "dec0_conv2", "head"),
}


def main():
    cpu = "--cpu" in sys.argv

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses import weighted_bce_with_logits
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms")

    width = 8 if cpu else 64
    out = 196 if cpu else 388
    cfg = ModelConfig(base_width=width, compute_dtype="bfloat16",
                      phase_level0=True)
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    names = list(params["params"].keys())
    for g, members in GROUPS.items():
        missing = [m for m in members if m not in names]
        if missing:
            raise SystemExit(f"group {g} names not in param tree: {missing}")

    # --- data/augment plumbing (the bench workload's shapes) ---
    crop = out
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=crop,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=crop))
    weight_fn = make_weight_fn("distance", max_objects=32)
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    indices = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(1)

    def time_variant(label, fn, *args):
        dt = timeit_readback(fn, *args)
        log(f"  {label:16s} {dt*1e3:7.2f} ms")
        return dt

    results = {}

    # component: augmentation
    aug_fn = jax.jit(lambda k: pipe._fn(images, targets, lp, pairs,
                                        indices, k))
    results["aug"] = time_variant("augment", aug_fn, key)
    inp, gt = jax.jit(aug_fn)(key)
    inp = jax.block_until_ready(inp)

    # component: weight maps (on the augmented targets, as the step sees them)
    results["weights"] = time_variant(
        "weights", jax.jit(lambda g: weight_fn(g)), gt)
    weights = jax.jit(lambda g: weight_fn(g))(gt)
    gt_f = jnp.asarray(gt > 0, jnp.float32)

    def loss_from(p_full, x):
        logits = model.apply(p_full, x)
        return weighted_bce_with_logits(logits, gt_f, weights)

    def merged(diff, fixed):
        d = dict(fixed)
        d.update(diff)
        return {"params": d}

    results["fwd"] = time_variant(
        "fwd+loss", jax.jit(lambda x: loss_from(params, x)), inp)
    results["dgrad"] = time_variant(
        "dgrad(input)", jax.jit(jax.grad(lambda x: loss_from(params, x))),
        inp)

    def grad_subset(exclude=()):
        diff0 = {k: v for k, v in params["params"].items()
                 if k not in exclude}
        fixed0 = {k: v for k, v in params["params"].items() if k in exclude}

        @jax.jit
        def f(x):
            loss, g = jax.value_and_grad(
                lambda d: loss_from(merged(d, fixed0), x))(diff0)
            return loss, g

        return f

    results["all"] = time_variant("bwd(all)", grad_subset(), inp)
    for gname, members in GROUPS.items():
        results[gname] = time_variant(f"bwd(all-{gname})",
                                      grad_subset(members), inp)

    # full fused step + scanned epoch, phase arm then plain control
    tx = make_optimizer(OptimConfig())
    n = 4 if cpu else 20
    reps = 1 if cpu else 3
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(
        jnp.arange(n))
    scan_ms = {}
    for arm in (True, False):
        m = UNet(ModelConfig(base_width=width, compute_dtype="bfloat16",
                             phase_level0=arm))
        step = make_train_step(m, weight_fn, "intended", tx)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
        state = TrainState(p, tx.init(p))
        if arm:
            results["step"] = time_variant(
                "full step", jax.jit(lambda s, x, g: step(s, x, g)),
                state, inp, gt)

        @jax.jit
        def run_n(state, keys, _step=step):
            def body(st, k):
                i, g = pipe._fn(images, targets, lp, pairs, indices, k)
                st, loss, _ = _step(st, i, g)
                return st, loss

            return jax.lax.scan(body, state, keys)

        state, losses = run_n(state, keys)
        float(losses[-1])
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            state, losses = run_n(state, keys)
            float(losses[-1])
            dt = max(time.perf_counter() - t0 - rt, 1e-9) / n
            best = dt if best is None else min(best, dt)
        scan_ms[arm] = best
        log(f"  scan epoch ({'phase' if arm else 'plain'}) "
            f"{best*1e3:7.2f} ms/step ({1.0/best:6.2f} steps/s)")

    log("attribution (phase-packed step, full-graph deltas):")
    base = results["all"]
    log(f"  augment        {results['aug']*1e3:7.2f} ms")
    log(f"  weights        {results['weights']*1e3:7.2f} ms")
    log(f"  forward+loss   {results['fwd']*1e3:7.2f} ms")
    log(f"  dgrad chain    {(results['dgrad'] - results['fwd'])*1e3:7.2f} ms"
        f" (grad-input total {results['dgrad']*1e3:.2f})")
    acc = 0.0
    for gname in GROUPS:
        d = base - results[gname]
        acc += d
        log(f"  wgrad {gname:8s} {d*1e3:7.2f} ms")
    log(f"  wgrad sum of deltas {acc*1e3:7.2f} ms "
        f"(full bwd {base*1e3:.2f} - dgrad-only {results['dgrad']*1e3:.2f} "
        f"= {(base - results['dgrad'])*1e3:.2f})")
    log(f"  full step      {results['step']*1e3:7.2f} ms "
        f"(scan-epoch engine {scan_ms[True]*1e3:.2f}; "
        f"plain control {scan_ms[False]*1e3:.2f}, healthy ref ~65.9)")


if __name__ == "__main__":
    main()
