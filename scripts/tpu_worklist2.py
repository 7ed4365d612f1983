"""TPU batch #2: (a) isolate the Pallas conv Mosaic-crash shapes;
(b) break down the 192 ms fused train step (augment vs weight maps vs
conv fwd+bwd)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0).astype(jnp.float32)))


def t_med(fn, n=6):
    sync(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.zeros(()).sum())
    print("session up", flush=True)
    rng = np.random.RandomState(0)

    # ---------------- (a) pallas conv shapes ----------------
    from tpu_unet.ops.conv_pallas import conv3x3_bias_relu

    for (h, cin, cout, br, tc) in [
        (178, 64, 64, 8, None),     # known crash
        (178, 64, 64, 16, None),
        (178, 64, 64, 8, 64),
        (130, 64, 64, 8, None),
        (66, 64, 64, 8, None),
        (90, 128, 128, 8, None),    # known crash
        (90, 128, 128, 8, 128),
        (48, 256, 256, 8, None),    # known good
        (178, 128, 128, 8, None),
    ]:
        x = jnp.asarray(rng.randn(2, h, h, cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.randn(cout) * 0.05, jnp.bfloat16)
        try:
            y = conv3x3_bias_relu(x, w, b, block_rows=br, cout_tile=tc)
            sync(y.astype(jnp.float32))
            print(f"conv h={h} cin={cin} cout={cout} br={br} tc={tc}: OK",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:130]
            print(f"conv h={h} cin={cin} cout={cout} br={br} tc={tc}: "
                  f"FAIL {msg}", flush=True)

    # ---------------- (b) train-step breakdown ----------------
    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import class_balance, make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.ops.cc import connected_components
    from tpu_unet.ops.edt import edt_batch
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step

    model = UNet(ModelConfig(compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    tx = make_optimizer(OptimConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    images, targets = jnp.asarray(data.images), jnp.asarray(data.targets)
    lp, pairs = jnp.asarray(data.crop_log_probs), jnp.asarray(data.crop_pairs)
    key = jax.random.PRNGKey(1)
    idx = np.array([0, 1])

    inp, gt = pipe(images, targets, lp, pairs, idx, key)
    sync(inp)

    dt = t_med(lambda: pipe(images, targets, lp, pairs, idx, key)[0])
    print(f"BREAKDOWN augment pipeline: {dt*1e3:.1f} ms", flush=True)

    wfn = jax.jit(lambda g: make_weight_fn("distance", max_objects=32)(g))
    dt = t_med(lambda: wfn(gt))
    print(f"BREAKDOWN weighted_map(EDT+CC, 32 planes): {dt*1e3:.1f} ms", flush=True)

    cc_j = jax.jit(lambda g: jax.vmap(connected_components)(g != 0))
    dt = t_med(lambda: cc_j(gt).astype(jnp.float32))
    print(f"BREAKDOWN connected components alone: {dt*1e3:.1f} ms", flush=True)

    from tpu_unet.ops.cc import component_planes
    planes_j = jax.jit(lambda g: jax.vmap(
        lambda m: component_planes(m, 32)[0])(g != 0))
    planes = planes_j(gt)
    sync(planes.astype(jnp.float32))
    edt_j = jax.jit(lambda p: jax.vmap(lambda q: edt_batch(q))(p))
    dt = t_med(lambda: edt_j(planes))
    print(f"BREAKDOWN EDT (2x32 planes, pallas): {dt*1e3:.1f} ms", flush=True)

    step_cb = make_train_step(model, class_balance, "intended", tx)
    dt = t_med(lambda: step_cb(state, inp, gt)[1])
    print(f"BREAKDOWN step w/ class_balance (conv fwd+bwd+sgd): {dt*1e3:.1f} ms",
          flush=True)

    step_full = make_train_step(model, make_weight_fn("distance", max_objects=32),
                                "intended", tx)
    dt = t_med(lambda: step_full(state, inp, gt)[1])
    print(f"BREAKDOWN full step w/ distance weights: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
