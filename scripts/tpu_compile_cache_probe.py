"""JAX persistent compilation cache probe on the axon backend (VERDICT r4
item 2).

Compiles cost 26-190 s per workload per process on this backend and were
the bulk of the exposure that nulled BENCH_r04 (188.5 s for one leg in a
degraded window). The repo had zero uses of `jax_compilation_cache_dir`;
this probe answers whether the persistent cache works through the remote
AOT helper:

  * enables the cache at a shared on-disk dir (default .jax_cache/),
  * times the compile+first-run of a representative serving graph
    (full-width bf16 U-Net forward, batch 16 x 1212^2 — the documented
    26-190 s class) and of a small control graph,
  * reports the cache directory's entry count/bytes before and after.

Run it TWICE in fresh processes (the r5 queue does): the second process's
compile time is the answer. ~1-3 s => the persistent cache hits across
processes; unchanged => the backend bypasses it (record the negative).
Note the remote-compile service may hold its own server-side cache — the
entry count tells the two apart (entries appear locally only if JAX's
persistent cache serialized the executable).

Usage: python scripts/tpu_compile_cache_probe.py [--cache-dir DIR] [--cpu]
       [--tile-in 1212] [--batch 16]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def cache_stats(d):
    files = [f for f in glob.glob(os.path.join(d, "**", "*"), recursive=True)
             if os.path.isfile(f)]
    return len(files), sum(os.path.getsize(f) for f in files)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir",
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), ".jax_cache"))
    ap.add_argument("--tile-in", type=int, default=1212)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp

    from tpu_unet.config import ModelConfig
    from tpu_unet.models import UNet

    n0, b0 = cache_stats(args.cache_dir)
    log(f"cache dir {args.cache_dir}: {n0} entries, {b0/1e6:.1f} MB (before)")
    log(f"device: {jax.devices()[0]}")

    log("establishing TPU session ...")
    t0 = time.perf_counter()
    float(jnp.zeros(()).sum())
    log(f"session up in {time.perf_counter() - t0:.1f}s")

    # small control graph: separates per-process session overhead from
    # compile time proper
    @jax.jit
    def small(x):
        return jnp.tanh(x @ x).sum()

    xs = jnp.ones((256, 256), jnp.bfloat16)
    t0 = time.perf_counter()
    float(small(xs))
    log(f"small control graph compile+run: {time.perf_counter() - t0:.2f}s")

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 188, 188, 1), jnp.float32))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, args.tile_in, args.tile_in, 1),
                           jnp.float32)
    float(jnp.sum(x[0, 0, 0]))

    @jax.jit
    def fwd(p, t):
        return jnp.sum(jnp.argmax(model.apply(p, t), axis=-1),
                       dtype=jnp.int32)

    log(f"compiling serving forward (batch {args.batch} x "
        f"{args.tile_in}^2 bf16) ...")
    t0 = time.perf_counter()
    float(fwd(params, x))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fwd(params, x))
    t_run = time.perf_counter() - t0
    log(f"compile+first run: {t_compile:.1f}s; steady run: {t_run:.2f}s "
        f"=> compile ~{t_compile - t_run:.1f}s")

    n1, b1 = cache_stats(args.cache_dir)
    log(f"cache dir after: {n1} entries, {b1/1e6:.1f} MB "
        f"(delta {n1 - n0:+d} entries, {(b1-b0)/1e6:+.1f} MB)")
    log("RESULT "
        f"compile_first_s={t_compile:.1f} steady_s={t_run:.2f} "
        f"cache_entries_before={n0} after={n1}")


if __name__ == "__main__":
    main()
