"""Partition the scanned-epoch train engine's cost (round 3 follow-up).

The phase-step attribution (results/r3/phase_attrib.txt) left one
unattributed item: the scan engine runs 46.59 ms/step while the isolated
components sum to 43.45 (fused step 38.26 + augment 5.19). This probe
splits the scanned epoch into its two halves and tests the one
reformulation that could claim the gap — staging augmentation out of the
scan body (precompute all n steps' augmented batches in one batched op,
then scan the bare train step over them):

  scan(full)        the production engine (augment + step per iteration)
  scan(step-only)   pre-augmented xs, scan body is just the train step
  scan(aug-only)    augment per iteration, no train step
  aug x n batched   ONE vmapped call producing all n batches (the staged
                    formulation's producer) vs n sequential scan steps

If scan(step-only) + aug-batched/n < scan(full), staged augmentation is
worth shipping behind a TrainConfig flag; otherwise the 46.6 ms engine is
confirmed composed-optimal and the gap is scheduling, not plumbing.

Usage: python scripts/tpu_scan_gap_probe.py [--cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    cpu = "--cpu" in sys.argv

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    rt = measure_roundtrip()

    width = 8 if cpu else 64
    crop = 196 if cpu else 388
    n = 4 if cpu else 20
    reps = 1 if cpu else 3
    log(f"roundtrip {rt*1e3:.1f} ms; n={n} steps, {reps} reps, crop={crop}")

    cfg = ModelConfig(base_width=width, compute_dtype="bfloat16",
                      phase_level0=True)
    model = UNet(cfg)
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, weight_fn, "intended", tx)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state0 = TrainState(params, tx.init(params))

    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=crop,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=crop))
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    indices = jnp.asarray([0, 1], jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(
        jnp.arange(n))

    def bench(label, fn, *args, per=n):
        def sync():
            r = fn(*args)
            leaf = jax.tree.leaves(r)[-1]
            float(jnp.sum(leaf.astype(jnp.float32)))

        sync()
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            sync()
            dt = max(time.perf_counter() - t0 - rt, 1e-9) / per
            best = dt if best is None else min(best, dt)
        log(f"  {label:24s} {best*1e3:7.2f} ms/step")
        return best

    # --- 1. production engine: scan(augment + step) ---
    @jax.jit
    def scan_full(state, keys):
        def body(st, k):
            i, g = pipe._fn(images, targets, lp, pairs, indices, k)
            st, loss, _ = step(st, i, g)
            return st, loss

        return jax.lax.scan(body, state, keys)

    r_full = bench("scan(full)", scan_full, state0, keys)

    # --- 2. staged: one batched augment producing all n batches ---
    @jax.jit
    def aug_all(keys):
        return jax.vmap(
            lambda k: pipe._fn(images, targets, lp, pairs, indices, k))(keys)

    r_augall = bench("aug x n (one vmap)", aug_all, keys)
    inp_all, gt_all = jax.jit(aug_all)(keys)

    # --- 3. scan(step-only) over the pre-augmented xs ---
    @jax.jit
    def scan_step_only(state, inp_all, gt_all):
        def body(st, xs):
            i, g = xs
            st, loss, _ = step(st, i, g)
            return st, loss

        return jax.lax.scan(body, state, (inp_all, gt_all))

    r_step = bench("scan(step-only)", scan_step_only, state0, inp_all, gt_all)

    # --- 4. scan(aug-only): the augment half inside scan context ---
    @jax.jit
    def scan_aug_only(keys):
        def body(acc, k):
            i, g = pipe._fn(images, targets, lp, pairs, indices, k)
            return acc + jnp.sum(i, dtype=jnp.float32) + jnp.sum(
                g, dtype=jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0), keys)

    r_aug = bench("scan(aug-only)", scan_aug_only, keys)

    # --- 5. the staged engine end-to-end: aug_all then scan(step-only) ---
    @jax.jit
    def staged_engine(state, keys):
        ia, ga = jax.vmap(
            lambda k: pipe._fn(images, targets, lp, pairs, indices, k))(keys)

        def body(st, xs):
            i, g = xs
            st, loss, _ = step(st, i, g)
            return st, loss

        return jax.lax.scan(body, state, (ia, ga))

    r_staged = bench("staged engine (e2e)", staged_engine, state0, keys)

    log("partition:")
    log(f"  scan(full)            {r_full*1e3:7.2f} ms/step  (production)")
    log(f"  scan(aug-only)        {r_aug*1e3:7.2f}")
    log(f"  scan(step-only)       {r_step*1e3:7.2f}")
    log(f"  sum aug+step          {(r_aug + r_step)*1e3:7.2f}")
    log(f"  aug as one vmap       {r_augall*1e3:7.2f}  (vs in-scan "
        f"{r_aug*1e3:.2f})")
    log(f"  staged engine e2e     {r_staged*1e3:7.2f}  "
        f"({'WINS' if r_staged < r_full else 'loses'} vs production "
        f"{r_full*1e3:.2f})")


if __name__ == "__main__":
    main()
