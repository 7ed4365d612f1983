"""Train-step cost attribution on the TPU (VERDICT r2 item 3): times the
fused step's components separately — augmentation (crop+rotate+elastic
gathers), distance weight maps (CC+EDT), and the fwd+bwd+SGD core — at the
HeLa config (batch 2, 572-in/388-out), with adaptive-reps readback timing.

Usage: python scripts/tpu_train_profile.py [--cpu]
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
    import numpy as np

    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    width = 8 if cpu else 64
    model = UNet(ModelConfig(base_width=width, compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    aug = AugmentConfig(crop=388)
    pipe = AugmentPipeline(aug)
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, weight_fn, "intended", tx)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)
    idx = np.array([0, 1])
    key = jax.random.PRNGKey(1)

    def t(label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  {label}: {d*1e3:.2f} ms")
            return d
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return None

    # components
    log("components (batch 2, 572-in/388-out):")
    t("augment (crop+rot+elastic x2 samples)",
      lambda k: pipe(images, targets, lp, pairs, idx, k)[0], key)
    inp, gt = pipe(images, targets, lp, pairs, idx, key)
    inp = jax.block_until_ready(inp)
    t("weight maps (CC+EDT, 388^2 x2)", lambda g: weight_fn(g), gt)

    # Return the FULL step output tuple: the timer chains its rep scan on
    # every leaf, so a loss-only return would let XLA delete the backward
    # and SGD update from the timed graph (the round-3 forward-only
    # "9.85 ms core" artifact, results/r3/README.md).
    t("train core (fwd+bwd+loss+weights+SGD)",
      lambda i, g: step(state, i, g), inp, gt)

    def full(state, k):
        i, g = pipe(images, targets, lp, pairs, idx, k)
        return step(state, i, g)

    t("full fused step (aug + core)", lambda k: full(state, k), key)

    fwd = jax.jit(lambda i, p: model.apply(p, i))
    t("forward only", fwd, inp, state.params)

    # backward split: input-grads only (dgrad) vs the full param backward
    from tpu_unet.losses import weighted_bce_with_logits
    from tpu_unet.models.unet import center_crop_or_pad

    wts = weight_fn(gt)

    def loss_of(p, i, g, w):
        logits = center_crop_or_pad(model.apply(p, i), g.shape[1:3])
        return weighted_bce_with_logits(logits, g, w, "intended")

    dgrad = jax.jit(lambda i, p, g, w: jax.grad(
        lambda ii: loss_of(p, ii, g, w))(i))
    t("fwd + dgrad (input grads only)", dgrad, inp, state.params, gt, wts)
    wgrad = jax.jit(lambda i, p, g, w: jax.grad(
        lambda pp: loss_of(pp, i, g, w))(p))
    t("fwd + full param bwd (wgrad+dgrad)", wgrad, inp, state.params, gt,
      wts)

    # augmentation internals: the warp gather alone at 572^2 x 2 channels
    from tpu_unet.data.augment import _fused_rotate_elastic_multi
    from tpu_unet.ops.warp import elastic_fields

    src = jax.random.uniform(jax.random.PRNGKey(2), (388, 388, 2))
    dx, dy = elastic_fields(jax.random.PRNGKey(3), (572, 572), 200.0, 10.0)
    t("single 572^2 fused warp gather (2ch)",
      lambda s: _fused_rotate_elastic_multi(s, jnp.float32(30.0), dx, dy, 572),
      src)
    t("elastic fields alone (2x gaussian blur 572^2)",
      lambda k: jnp.stack(elastic_fields(k, (572, 572), 200.0, 10.0)),
      jax.random.PRNGKey(4))


if __name__ == "__main__":
    main()
