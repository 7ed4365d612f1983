"""Auxiliary subsystems: profiler trace capture, step timer, debug flags,
parity-broadcast training wiring."""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from tpu_unet.utils import StepTimer, debug_flags, trace_capture


def test_trace_capture_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace_capture(logdir):
        x = jnp.ones((64, 64))
        float((x @ x).sum())
    # jax.profiler writes plugins/profile/<run>/*.trace.json.gz (or .pb)
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((128, 128))
    for _ in range(3):
        t.start()
        y = x @ x
        t.stop(y)
    assert len(t.times) == 3
    assert t.mean > 0 and t.p50 > 0 and t.best() > 0


def test_debug_flags_restore():
    before = jax.config.jax_debug_nans
    with debug_flags(nan_checks=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_parity_broadcast_training_wiring(tmp_path):
    # weight_broadcast='parity' requires batch == num_classes == 2; a one-epoch
    # fit exercises the wiring end to end (reference accidental semantics,
    # SURVEY.md §2.9).
    from tpu_unet.config import (AugmentConfig, DatasetConfig, LossConfig,
                                 ModelConfig, TrainConfig)
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.train import Trainer

    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=2)
    ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                       weight_mode="class_balance", goal=0.999,
                       goal_direction="max")
    tr = Trainer(ds, model_cfg=ModelConfig(base_width=2),
                 train_cfg=TrainConfig(batch_size=2, epochs=0,
                                       checkpoint_every=100),
                 aug_cfg=AugmentConfig(crop=20),
                 loss_cfg=LossConfig(weight_mode="class_balance",
                                     weight_broadcast="parity"),
                 out_dir=str(tmp_path / "run"), verbose=False)
    hist = tr.fit(data, data, epochs=0)
    assert np.isfinite(hist["loss"][0])


def test_timeit_readback_cpu():
    # The adaptive readback timer (the round-2 measurement-hygiene fix) works
    # on CPU too: positive roundtrip, positive per-call time, correct value.
    import jax.numpy as jnp

    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    rt = measure_roundtrip()
    assert rt >= 0
    # min_work_s > 0 exercises the adaptive-reps path and keeps the timed
    # work above the host-scheduler noise floor (a min_work_s=0 probe can
    # measure less than the roundtrip subtraction under full-suite load).
    d = timeit_readback(lambda x: x * 2.0, jnp.ones((256, 256)),
                        n=2, reps=2, min_work_s=0.02)
    assert d > 0
