"""Preemption recovery: SIGTERM mid-training checkpoints and resume continues
(SURVEY.md §5.3 — the reference has no working recovery path)."""

import os
import signal
import subprocess
import sys
import textwrap

import numpy as np


def test_sigterm_checkpoints_and_resume(tmp_path):
    script = textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        import jax; jax.config.update("jax_platforms", "cpu")
        from tpu_unet.config import (AugmentConfig, DatasetConfig, LossConfig,
                                     ModelConfig, TrainConfig)
        from tpu_unet.data import synthetic_dataset
        from tpu_unet.train import Trainer
        data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=1)
        ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                           weight_mode="class_balance", goal=0.999,
                           goal_direction="max")
        t = Trainer(ds, model_cfg=ModelConfig(base_width=2),
                    train_cfg=TrainConfig(batch_size=2, epochs=500,
                                          checkpoint_every=1000),
                    aug_cfg=AugmentConfig(crop=20),
                    loss_cfg=LossConfig(weight_mode="class_balance"),
                    out_dir={str(tmp_path / 'run')!r}, verbose=False)
        print("READY", flush=True)
        try:
            t.fit(data, data, epochs=500)
        except KeyboardInterrupt:
            print("PREEMPTED_CLEANLY", flush=True)
            sys.exit(0)
        print("FINISHED?!", flush=True)
    """)
    proc = subprocess.Popen([sys.executable, "-u", "-c", script],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True)
    # wait for training to actually start, then SIGTERM
    line = proc.stdout.readline()
    assert "READY" in line
    import time

    time.sleep(18)  # let at least one epoch complete (CPU compiles included)
    proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=300)
    assert "PREEMPTED_CLEANLY" in out, (out, err[-2000:])
    # 'latest' checkpoint exists and resume works
    assert os.path.isdir(tmp_path / "run" / "models" / "latest")

    from tpu_unet.config import (AugmentConfig, DatasetConfig, LossConfig,
                                 ModelConfig, TrainConfig)
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.train import Trainer

    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=1)
    ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                       weight_mode="class_balance", goal=0.999,
                       goal_direction="max")
    t = Trainer(ds, model_cfg=ModelConfig(base_width=2),
                train_cfg=TrainConfig(batch_size=2, epochs=500,
                                      checkpoint_every=1000),
                aug_cfg=AugmentConfig(crop=20),
                loss_cfg=LossConfig(weight_mode="class_balance"),
                out_dir=str(tmp_path / "run"), verbose=False)
    import json

    hs = json.load(open(tmp_path / "run" / "models" / "latest" / "host_state.json"))
    resumed_epoch = hs["epoch"]
    hist = t.fit(data, data, epochs=resumed_epoch + 2, resume=True)
    # full curves: the preempted run's epochs 0..resumed_epoch preloaded from
    # metrics.jsonl, plus exactly the two remaining epochs
    assert len(hist["loss"]) == resumed_epoch + 3
    prog = tmp_path / "run" / "progress"
    assert len(np.loadtxt(prog / "loss.out", ndmin=1)) == resumed_epoch + 3
    epochs_seen = [json.loads(l)["epoch"] for l in open(prog / "metrics.jsonl")]
    assert epochs_seen == list(range(resumed_epoch + 3))  # contiguous, no restart
