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
