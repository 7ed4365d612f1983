"""In-graph backward attribution for the train step (round 3).

The per-layer probe (results/r3/bwd_probe*.txt) times each conv's gradients
in ISOLATION, which both (a) lets XLA pick layouts it can't afford in the
full graph and (b) omits the upconvs, pools, crop and loss transposes
entirely — and its numbers proved window-sensitive. This script attributes
the backward INSIDE the real fwd+loss graph instead: it times

  fwd        forward + weighted-BCE loss, no gradients
  dgrad      grad w.r.t. the input image only (full input-gradient chain,
             zero weight gradients)
  all        grad w.r.t. every parameter (the step's real backward)
  all-G      grad w.r.t. every parameter EXCEPT group G, for each layer
             group — ('all' - 'all-G') is G's weight-gradient cost as the
             full graph actually schedules it

at the HeLa config (batch 2, 572-in/388-out, bf16 compute), adaptive-reps
readback timing. Usage: python scripts/tpu_bwd_attrib.py [--cpu]
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

    from tpu_unet.config import ModelConfig
    from tpu_unet.core.geometry import input_size_for_output
    from tpu_unet.losses import weighted_bce_with_logits, weighted_map
    from tpu_unet.models import UNet
    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    width = 8 if cpu else 64
    out = 68 if cpu else 388
    s = input_size_for_output(out)
    model = UNet(ModelConfig(base_width=width, compute_dtype="bfloat16"))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    names = list(params["params"].keys())
    for g, members in GROUPS.items():
        missing = [m for m in members if m not in names]
        if missing:
            raise SystemExit(f"group {g} names not in param tree: {missing}")

    key = jax.random.PRNGKey(1)
    inp = jax.random.normal(key, (2, s, s, 1), jnp.float32)
    lbl = np.zeros((2, out, out), np.int32)
    for i, (cy, cx) in enumerate(((100, 90), (240, 300), (60, 280))):
        yy, xx = np.mgrid[:out, :out]
        lbl[:, ((yy - cy) ** 2 + (xx - cx) ** 2) < 28 ** 2] = i + 1
    gt = jnp.asarray((lbl > 0).astype(np.float32))
    weights = weighted_map(jnp.asarray(lbl), max_objects=8)

    def loss_from(p_full, x):
        logits = model.apply(p_full, x)
        return weighted_bce_with_logits(logits, gt, weights)

    def merged(diff, fixed):
        d = dict(fixed)
        d.update(diff)
        return {"params": d}

    def time_variant(label, fn, *args):
        dt = timeit_readback(fn, *args)
        log(f"  {label:14s} {dt*1e3:7.2f} ms")
        return dt

    results = {}

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

    log("attribution (full-graph deltas):")
    base = results["all"]
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


if __name__ == "__main__":
    main()
