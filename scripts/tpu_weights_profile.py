"""Weight-map component profile (train-step cost attribution, round 3).

The fused train step spends ~16 ms in the distance weight maps at b2x388^2
(results/r3/train_profile.txt). This attributes that cost across the chain:

  connected_components (while_loop min-propagation)
  -> id extraction (jnp.unique = sort on TPU vs iterative-min candidate)
  -> per-object planes
  -> EDT row phase (cummax/cummin scans)
  -> EDT column pass (Pallas kernel)
  -> the full weighted_map

Usage: python scripts/tpu_weights_profile.py
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

    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    from tpu_unet.data import synthetic_dataset
    from tpu_unet.losses.weights import weighted_map
    from tpu_unet.ops.cc import component_planes, connected_components, _SENTINEL
    from tpu_unet.ops.edt import _row_distance, edt_batch
    from tpu_unet.ops.edt_pallas import column_pass_pallas

    H = 388
    K = 32
    data = synthetic_dataset(n_images=2, h=H + 32, w=H + 32, n_cells=5,
                             crop=H, seed=0)
    gt = jnp.asarray((data.targets[:, 16:16 + H, 16:16 + H] > 0))
    fg = gt  # [2, H, W] bool
    log(f"workload: {fg.shape} bool, {int(fg.sum())} fg px")

    def t(label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  {label}: {d*1e3:.3f} ms")
            return d
        except Exception as e:
            log(f"  {label}: FAIL {type(e).__name__}: {str(e)[:110]}")
            return None

    # 1. CC propagation alone
    f_cc = jax.jit(jax.vmap(connected_components))
    t("connected_components (b2)", lambda m: f_cc(m).sum(), fg)

    # 2. id extraction: unique (sort) vs iterative min
    lab = f_cc(fg)

    def ids_unique(lab1):
        u = jnp.unique(lab1, size=K + 1, fill_value=_SENTINEL)
        return u[:K]

    def ids_itermin(lab1):
        def body(prev, _):
            nxt = jnp.min(jnp.where(lab1 > prev, lab1, _SENTINEL))
            return nxt, nxt
        _, ids = jax.lax.scan(body, -jnp.int32(1), None, length=K)
        return ids

    t("ids via jnp.unique (b2)",
      lambda l: jax.vmap(ids_unique)(l).sum(), lab)
    t("ids via iterative min (b2)",
      lambda l: jax.vmap(ids_itermin)(l).sum(), lab)
    same = np.array_equal(np.asarray(jax.vmap(ids_unique)(lab)),
                          np.asarray(jax.vmap(ids_itermin)(lab)))
    log(f"  id sets equal: {same}")

    # 3. full component_planes
    f_cp = jax.jit(jax.vmap(lambda m: component_planes(m, K)[0]))
    t("component_planes (b2, K=32)", lambda m: f_cp(m).sum(), fg)

    # 4. EDT row phase on the planes
    planes = f_cp(fg)  # [2, K, H, W]
    flat = planes.reshape(2 * K, H, H)
    f_row = jax.jit(jax.vmap(_row_distance))
    t("EDT row phase (64 planes)",
      lambda p: jnp.where(jnp.isinf(f_row(p)), 0.0, f_row(p)).sum(), flat)

    # 5. Pallas column pass: exact vs banded, live-plane counts
    g = jax.vmap(_row_distance)(flat)
    g2 = jnp.where(jnp.isinf(g), jnp.inf, g * g)
    for band in (None, 40):
        for nv in (5, 32):
            t(f"pallas column pass (64 planes, band={band}, nv={nv}*2)",
              lambda x, _nv=nv, _b=band: jnp.where(
                  jnp.isinf(column_pass_pallas(x, num_valid=jnp.int32(2 * _nv),
                                               band=_b)),
                  0.0,
                  column_pass_pallas(x, num_valid=jnp.int32(2 * _nv),
                                     band=_b)).sum(),
              g2)

    # 6. edt_batch end-to-end and the full map (banded default vs exact)
    t("edt_batch (64 planes, band=40)",
      lambda p: jnp.where(jnp.isinf(edt_batch(p, band=40)), 0.0,
                          edt_batch(p, band=40)).sum(), flat)
    for band in (None, 40):
        f_wm = jax.jit(lambda g_, _b=band: weighted_map(
            g_.astype(jnp.int32), edt_band=_b))
        t(f"weighted_map (b2, K=32, edt_band={band})",
          lambda g_, _f=f_wm: _f(g_).sum(), fg)


if __name__ == "__main__":
    main()
