"""Persistent XLA compilation cache (measured WIN on the axon TPU backend).

Compiles on the remote-tunnel backend cost 16-190 s per workload per
process; the r5 probe measured the persistent cache taking a representative
serving forward (batch 16 x 1212^2 bf16) from 16.3 s cold to **1.6 s** in a
fresh process (results/r5/cache_probe_run{1,2}.txt), with executables
serialized locally (~330 MB for the bench suite). Production impact: a
preemption -> ``-sf`` resume re-pays the trainer's compile today; with the
cache enabled the resumed process recompiles from disk in seconds.

No reference counterpart: torch/CUDA kernels ship precompiled
(SURVEY.md §2.13); under XLA the compile step is part of the runtime, so
caching it is framework work.
"""

from __future__ import annotations

import os
from typing import Optional


def default_cache_dir() -> str:
    """``$TPU_UNET_COMPILE_CACHE`` if set, else ``~/.cache/tpu_unet/jax_cache``."""
    env = os.environ.get("TPU_UNET_COMPILE_CACHE")
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".cache", "tpu_unet",
                        "jax_cache")


def enable_persistent_compilation_cache(
        cache_dir: Optional[str] = None,
        min_compile_secs: float = 2.0) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing; default :func:`default_cache_dir`). Returns the directory in
    use, or ``None`` if the cache could not be enabled (never raises — a
    backend that cannot serialize executables degrades to cold compiles
    with a JAX warning, which is the status quo ante)."""
    import jax

    if cache_dir is None:
        cache_dir = default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:
        return None
    return cache_dir
