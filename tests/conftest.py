"""Test configuration: run everything on a virtual 8-device CPU mesh
(SURVEY.md §4 — the JAX-idiomatic fake backend for multi-device tests),
keeping the single real TPU chip free for benchmarks.

Note: this environment's TPU boot hook (sitecustomize) force-sets
``jax_platforms`` at interpreter start, so the env var alone is not enough —
we re-pin the config to CPU after importing jax, before any backend is used.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
