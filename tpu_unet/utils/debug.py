"""Debug flags (SURVEY.md §5.2 — the TPU-meaningful analog of sanitizers):
NaN checking and jit-boundary disabling behind one switch."""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Trap NaNs at op granularity (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def debug_flags(nan_checks: bool = False, disable_jit: bool = False):
    """Temporarily flip debug switches around a suspect region."""
    prev_nan = jax.config.jax_debug_nans
    try:
        if nan_checks:
            jax.config.update("jax_debug_nans", True)
        ctx = jax.disable_jit() if disable_jit else contextlib.nullcontext()
        with ctx:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
