"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference, which
only prints epoch wall-clock, ``trainer.py:44,159``).

* `trace_capture`: context manager around training steps writing a
  ``jax.profiler`` trace viewable in TensorBoard/Perfetto.
* `StepTimer`: lightweight per-step wall-clock statistics with device sync,
  used by bench.py and the trainer's verbose mode.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace_capture(log_dir: str):
    """Capture a profiler trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with explicit device synchronization."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def best(self) -> float:
        return float(np.min(self.times)) if self.times else float("nan")


# -- readback-based timing for the tunnel TPU backend -------------------------

_ROUNDTRIP: Optional[float] = None


def measure_roundtrip(n: int = 6) -> float:
    """Median host<->device scalar readback latency (the axon tunnel's ~30 ms;
    `block_until_ready` is a no-op there, so all timing is readback-based)."""
    global _ROUNDTRIP
    import jax.numpy as jnp

    @jax.jit
    def noop(x):
        return x + 1

    float(noop(jnp.int32(0)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(noop(jnp.int32(0)))
    _ROUNDTRIP = (time.perf_counter() - t0) / n
    return _ROUNDTRIP


def timeit_readback(fn, *args, n: int = 3, reps: int = 6,
                    min_work_s: float = 0.3) -> float:
    """Median seconds per `fn(*args)` call on the tunnel backend: runs `reps`
    dependency-chained calls inside one jit, forces a scalar readback,
    subtracts the measured roundtrip. Adaptive: re-jits with more reps until
    the measured work dominates the roundtrip (short probes are noise —
    results/r2/README.md)."""
    import jax.numpy as jnp
    from jax import lax

    if _ROUNDTRIP is None:
        measure_roundtrip()
    rt = _ROUNDTRIP

    def make(reps):
        @jax.jit
        def run(*a):
            def body(c, _):
                aa = list(a)
                # Chain the carry into the first array leaf of the first
                # argument (works for bare arrays and pytrees alike).
                leaves, treedef = jax.tree.flatten(aa[0])
                l0 = leaves[0]
                leaves[0] = (l0 + c.astype(l0.dtype)) \
                    if l0.dtype == jnp.int8 \
                    else l0 + (c * 1e-30).astype(l0.dtype)
                aa[0] = jax.tree.unflatten(treedef, leaves)
                y = fn(*aa)
                # Consume EVERY output leaf: anything the carry does not
                # depend on is dead code inside this jit and XLA deletes it
                # from the timed region. Round 3 burned itself here: step
                # lambdas returning only the loss measured a forward-only
                # "train step" (the whole backward+SGD was DCE'd) —
                # results/r3/README.md. fn must still return every tensor
                # whose cost it wants timed.
                s = sum(jnp.sum(leaf.astype(jnp.float32))
                        for leaf in jax.tree.leaves(y))
                return s * 1e-30, None
            s, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
            return s
        return run

    run = make(reps)
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    est = (time.perf_counter() - t0 - rt) / reps
    if est * reps < min_work_s:
        reps = min(512, max(reps, int(np.ceil(min_work_s / max(est, 1e-6)))))
        run = make(reps)
        float(run(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0 - rt) / reps)
    # The roundtrip subtraction can push a tiny measurement below zero under
    # host scheduler noise (timed work smaller than the noise floor). A
    # duration is physically positive: clamp so callers never divide by / sort
    # on a negative time.
    return max(float(np.median(times)), 1e-9)
