"""One-session TPU experiment batch (session claims cost minutes; batch all
chip work):

1. train-step throughput (fused HeLa-config step) — BASELINE config 3/5 info;
2. int8 vs bf16 conv microbench at U-Net shapes — is an int8 serving path
   worth building on v5e (394 TOPS int8 vs 197 TFLOPs bf16)?
3. eval-step timing (whole-image forward at 700-in).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0).astype(jnp.float32)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(2):
        sync(fn(*args))
    per_call_sync = (time.perf_counter() - t0) / 2

    @jax.jit
    def chained(*a):
        def body(c, _):
            return fn(*((c,) + a[1:])) if a else fn(), None
        y, _ = lax.scan(body, a[0], None, length=iters)
        return y

    try:
        sync(chained(*args))
        t0 = time.perf_counter()
        sync(chained(*args))
        return (time.perf_counter() - t0) / iters
    except Exception:
        return per_call_sync  # fallback incl. roundtrip


def main():
    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.zeros(()).sum())
    print("session up", flush=True)

    # ---------------- 1. fused train step ----------------
    from tpu_unet.config import AugmentConfig, ModelConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.models import UNet
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step

    model = UNet(ModelConfig(compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    pipe = AugmentPipeline(AugmentConfig(crop=388))
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, make_weight_fn("distance", max_objects=32),
                           "intended", tx)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    images, targets = jnp.asarray(data.images), jnp.asarray(data.targets)
    lp, pairs = jnp.asarray(data.crop_log_probs), jnp.asarray(data.crop_pairs)

    t0 = time.perf_counter()
    inp, gt = pipe(images, targets, lp, pairs, np.array([0, 1]),
                   jax.random.PRNGKey(1))
    state2, loss, _ = step(state, inp, gt)
    float(loss)
    print(f"train step compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    n = 20
    t0 = time.perf_counter()
    st = state
    for i in range(n):
        inp, gt = pipe(images, targets, lp, pairs, np.array([0, 1]),
                       jax.random.fold_in(jax.random.PRNGKey(2), i))
        st, loss, _ = step(st, inp, gt)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"TRAIN: fused step (batch 2, 572-in, EDT weights): {dt*1e3:.1f} ms "
          f"-> {1/dt:.2f} steps/s, {2/dt:.2f} samples/s", flush=True)

    # ---------------- 2. int8 vs bf16 conv ----------------
    rng = np.random.RandomState(0)
    for (h, cin, cout) in [(348, 64, 128), (172, 128, 256), (86, 256, 512)]:
        xb = jnp.asarray(rng.randn(8, h, h, cin), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (8, h, h, cin)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (3, 3, cin, cout)), jnp.int8)
        dn = lax.conv_dimension_numbers(xb.shape, wb.shape, ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_bf16(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_int8(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        try:
            tb = timeit(lambda x: conv_bf16(x, wb).astype(jnp.bfloat16), xb)
            gf = 2 * 9 * cin * cout * 8 * (h - 2) ** 2 / 1e9
            print(f"INT8? {h}x{cin}->{cout}: bf16 {tb*1e3:.2f} ms "
                  f"({gf/tb/1e3:.0f} TF/s)", flush=True)
            ti = timeit(lambda x: conv_int8(x, wi).astype(jnp.int8), xi)
            print(f"      {h}x{cin}->{cout}: int8 {ti*1e3:.2f} ms "
                  f"({gf/ti/1e3:.0f} TOP/s) speedup {tb/ti:.2f}x", flush=True)
        except Exception as e:
            print(f"      int8 conv failed: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    # ---------------- 3. whole-image eval forward ----------------
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 700, 700, 1))
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(p, x):
        return jnp.argmax(model.apply(p, x), -1)

    dt = timeit(lambda x: x, x, iters=1)  # warm the timer path
    t0 = time.perf_counter()
    sync(fwd(pb, x).astype(jnp.float32))
    print(f"eval fwd compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(fwd(pb, x).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    print(f"EVAL: 8x700^2 forward: {np.median(times)*1e3:.1f} ms "
          f"(incl roundtrip)", flush=True)


if __name__ == "__main__":
    main()
