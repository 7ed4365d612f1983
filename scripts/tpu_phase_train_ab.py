"""A/B the phase-packed level 0 in the TRAINING step on hardware (round 3).

Times the production scanned-epoch engine (the exact bench.py --mode train
workload: on-device augmentation + EDT distance weights + weighted BCE +
backward + SGD, batch 2, 572-in bf16) with ModelConfig.phase_level0 off/on
in ONE TPU session, so the numbers share a chip window.

Motivation: the honest step attribution (results/r3/train_profile3.txt)
puts fwd+bwd convs at ~46 of the 66 ms step, and level 0's 64-channel convs
run far off the 128-lane MXU rate in the serving profile
(results/r2/stage_profile.txt). The phase formulation runs them as 2x2
convs at 4x channels (full lanes) for 16/9 the FLOPs — exactness and
gradient equality are CPU-verified in tests/test_phase_train.py; this
script answers whether XLA's emitters reward it inside the fused train
graph (forward AND both gradient convs change shape).

Usage: python scripts/tpu_phase_train_ab.py [n_steps_per_epoch] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from tpu_unet.config import (AugmentConfig, ModelConfig, OptimConfig)
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models.unet import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()
    log(f"roundtrip {rt*1e3:.1f} ms; n={n} steps/epoch, {reps} reps")

    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    indices = jnp.asarray([0, 1], jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(
        jnp.arange(n))

    results = {}
    losses_by_arm = {}
    for arm in (False, True):
        cfg = ModelConfig(compute_dtype="bfloat16", phase_level0=arm)
        model = UNet(cfg)
        step = make_train_step(model, weight_fn, "intended", tx)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
        state = TrainState(params, tx.init(params))

        @jax.jit
        def run_n(state, keys):
            def body(st, key):
                inp, gt = pipe._fn(images, targets, lp, pairs, indices, key)
                st, loss, metrics = step(st, inp, gt)
                return st, loss

            return jax.lax.scan(body, state, keys)

        t0 = time.perf_counter()
        state, losses = run_n(state, keys)
        last = float(losses[-1])
        losses_by_arm[arm] = last
        log(f"phase_level0={arm}: compile+first epoch "
            f"{time.perf_counter()-t0:.1f}s (loss {last:.4f})")
        best = None
        for r in range(reps):
            t0 = time.perf_counter()
            state, losses = run_n(state, keys)
            float(losses[-1])
            dt = max(time.perf_counter() - t0 - rt, 1e-9) / n
            log(f"  rep {r}: {dt*1e3:6.2f} ms/step -> {1.0/dt:6.2f} steps/s")
            best = dt if best is None else min(best, dt)
        results[arm] = best

    # Same init (canonical parameter tree) + same data keys -> the two arms
    # run the same optimization trajectory; a large loss gap flags a bug,
    # bf16 reassociation keeps them from being identical.
    log(f"epoch-end loss: plain {losses_by_arm[False]:.4f} "
        f"phase {losses_by_arm[True]:.4f}")
    base = results[False]
    for arm, dt in results.items():
        nm = "phase" if arm else "plain"
        log(f"RESULT {nm:5s}: {dt*1e3:6.2f} ms/step "
            f"({1.0/dt:6.2f} steps/s, {base/dt:.2f}x vs plain)")


if __name__ == "__main__":
    main()
