"""Loop-vs-scan train-step formulation probe (round 3).

The component profile measured the fused step at 22.7 ms via a pipelined
dispatch loop (timeit_readback), but the scanned whole-epoch engine measures
65.9 ms/step in two separate sessions. Same device work on paper — this
times both formulations back-to-back in ONE session to separate formulation
cost from pooled-chip window variance, then bisects the scan body.

Usage: python scripts/tpu_scan_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    log(f"roundtrip {rt*1e3:.1f} ms")

    model = UNet(ModelConfig(base_width=64, compute_dtype="bfloat16"))
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
    indices = jnp.asarray([0, 1], jnp.int32)
    key0 = jax.random.PRNGKey(1)
    n = 10
    keys = jax.vmap(lambda i: jax.random.fold_in(key0, i))(jnp.arange(n))

    def timeloop(label, fn, reps=3):
        fn()                      # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            d = (time.perf_counter() - t0 - rt) / n
            best = min(best, d)
        log(f"  {label}: {best*1e3:.2f} ms/step (best of {reps})")
        return best

    # A. pipelined dispatch loop (the profile's formulation)
    def loop_fn():
        st = state
        for i in range(n):
            inp, gt = pipe(images, targets, lp, pairs, indices, keys[i])
            st, loss, m = step(st, inp, gt)
        float(loss)

    timeloop("dispatch loop (pipe jit + step jit)", loop_fn)

    # B. one scanned graph (the epoch engine)
    @jax.jit
    def run_scan(st, ks):
        def body(s, k):
            inp, gt = pipe._fn(images, targets, lp, pairs, indices, k)
            s, loss, m = step(s, inp, gt)
            return s, loss
        return jax.lax.scan(body, st, ks)

    timeloop("lax.scan epoch", lambda: float(run_scan(state, keys)[1][-1]))

    # C. scan without the augmentation (fixed batch) — bisect
    inp0, gt0 = pipe(images, targets, lp, pairs, indices, keys[0])
    float(jnp.sum(inp0))

    @jax.jit
    def run_scan_core(st, ks):
        def body(s, k):
            s, loss, m = step(s, inp0, gt0)
            return s, loss
        return jax.lax.scan(body, st, ks)

    timeloop("scan, step only (fixed batch)",
             lambda: float(run_scan_core(state, keys)[1][-1]))

    # D. dispatch loop, step only
    def loop_core():
        st = state
        for _ in range(n):
            st, loss, m = step(st, inp0, gt0)
        float(loss)

    timeloop("dispatch loop, step only", loop_core)

    # E. scan of augmentation only
    @jax.jit
    def run_scan_aug(ks):
        def body(c, k):
            inp, gt = pipe._fn(images, targets, lp, pairs, indices, k)
            return c + jnp.sum(inp, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), ks)
        return acc

    timeloop("scan, augment only", lambda: float(run_scan_aug(keys)))


if __name__ == "__main__" and "--bisect" not in sys.argv:
    main()


def bisect():
    """Step-internal bisection with the real augmented batch."""
    import jax
    import jax.numpy as jnp

    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.metrics import batch_evaluation_metrics
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.losses import weighted_bce_with_logits
    from tpu_unet.models import UNet
    from tpu_unet.models.unet import center_crop_or_pad
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    model = UNet(ModelConfig(base_width=64, compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, weight_fn, "intended", tx)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    inp, gt = pipe(jnp.asarray(data.images), jnp.asarray(data.targets),
                   jnp.asarray(data.crop_log_probs),
                   jnp.asarray(data.crop_pairs),
                   jnp.asarray([0, 1], jnp.int32), jax.random.PRNGKey(1))
    inp = jax.block_until_ready(inp)
    n_obj = [int(x) for x in jnp.sum(
        jnp.asarray([[(jnp.unique(jnp.where(g != 0, 1, 0), size=2)).shape[0]]
                     for g in gt]))] if False else None
    log(f"augmented batch: inp {inp.shape} gt {gt.shape}, "
        f"fg px {int(jnp.sum(gt != 0))}")

    def t(label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  {label}: {d*1e3:.2f} ms")
            return d
        except Exception as e:
            log(f"  {label}: FAIL {type(e).__name__}: {str(e)[:100]}")

    # full outputs returned everywhere — the timer chains its scan on every
    # leaf, so partial returns would DCE the untimed remainder
    t("full step", lambda i, g: step(state, i, g), inp, gt)
    t("weight_fn(gt)", lambda g: jnp.sum(weight_fn(g)), gt)
    fwd = jax.jit(lambda i, p: jnp.sum(model.apply(p, i).astype(jnp.float32)))
    t("fwd only", fwd, inp, state.params)

    wts = jax.block_until_ready(weight_fn(gt))

    @jax.jit
    def fwd_bwd(i, p, g, w):
        def loss_fn(pp):
            logits = model.apply(pp, i)
            logits = center_crop_or_pad(logits, g.shape[1:3])
            return weighted_bce_with_logits(logits, g, w, "intended")
        l, grads = jax.value_and_grad(loss_fn)(p)
        return l + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(grads))

    t("fwd+bwd (precomputed weights)", fwd_bwd, inp, state.params, gt, wts)

    @jax.jit
    def metrics_only(i, g):
        logits = model.apply(state.params, i)
        logits = center_crop_or_pad(logits, g.shape[1:3])
        preds = jnp.argmax(logits, axis=-1)
        return jnp.sum(batch_evaluation_metrics(preds, g))

    t("fwd + metrics", metrics_only, inp, gt)

    @jax.jit
    def opt_only(i, st):
        zeros = jax.tree.map(lambda x: jnp.zeros_like(x) + i[0, 0, 0, 0],
                             st.params)
        updates, opt_state = tx.update(zeros, st.opt_state, st.params)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(updates))

    t("optimizer update only", opt_only, inp, state)


if __name__ == "__main__" and "--bisect" in sys.argv:
    bisect()
    sys.exit(0)
