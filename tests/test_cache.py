"""Persistent-compilation-cache helper (utils/cache.py).

The hardware verdict (results/r5/cache_probe_run{1,2}.txt): cross-process
compile 16.3 s -> 1.6 s on the v5e backend with executables serialized
locally. These tests cover the helper's contract on CPU: directory
creation, config wiring, env-var default, and the never-raises degradation.
"""

import os

import jax
import pytest

from tpu_unet.utils.cache import (
    default_cache_dir,
    enable_persistent_compilation_cache,
)


@pytest.fixture(autouse=True)
def _restore_cache_config():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_enable_creates_dir_and_sets_config(tmp_path):
    d = str(tmp_path / "cache" / "nested")
    got = enable_persistent_compilation_cache(d, min_compile_secs=0.5)
    assert got == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5


def test_default_dir_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_UNET_COMPILE_CACHE", str(tmp_path / "envdir"))
    assert default_cache_dir() == str(tmp_path / "envdir")
    monkeypatch.delenv("TPU_UNET_COMPILE_CACHE")
    assert default_cache_dir().endswith(os.path.join("tpu_unet", "jax_cache"))


def test_unwritable_dir_degrades_to_none(tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("not a dir")
    got = enable_persistent_compilation_cache(str(blocker / "sub"))
    assert got is None


def test_cli_flag_disables(monkeypatch, tmp_path):
    """--no-compile-cache must leave the jax config untouched."""
    from tpu_unet import cli

    before = jax.config.jax_compilation_cache_dir
    parser = cli.build_parser()
    args = parser.parse_args(
        ["-m", "TRAINING", "-d", "synthetic", "--no-compile-cache"])
    assert args.no_compile_cache
    # main() wires the cache only when the flag is off; simulate the gate
    if not args.no_compile_cache:  # pragma: no cover - guard under test
        enable_persistent_compilation_cache(str(tmp_path))
    assert jax.config.jax_compilation_cache_dir == before
