"""Training engine: plateau scheduler (golden vs torch), SGD parity,
end-to-end fit on the synthetic fixture, checkpoint/resume."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tpu_unet.config import (
    AugmentConfig,
    DatasetConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from tpu_unet.data import synthetic_dataset
from tpu_unet.train import Trainer, plateau_init, plateau_step
from tpu_unet.train.optimizer import make_optimizer, set_learning_rate


# ------------------------------------------------------- plateau scheduler


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_plateau_matches_torch(seed):
    cfg = OptimConfig(lr=0.1, plateau_factor=0.5, plateau_patience=3,
                      plateau_threshold=1e-3, plateau_eps=1e-8)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=cfg.lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=cfg.plateau_factor, patience=cfg.plateau_patience,
        threshold=cfg.plateau_threshold, threshold_mode="rel", eps=cfg.plateau_eps,
    )
    state = plateau_init(cfg)
    rng = np.random.RandomState(seed)
    metric = 1.0
    for step in range(60):
        # plateau-ish sequence: mostly flat with occasional improvements
        if rng.rand() < 0.15:
            metric *= 0.8
        sched.step(metric)
        state, _ = plateau_step(state, metric, cfg)
        torch_lr = opt.param_groups[0]["lr"]
        assert state.lr == pytest.approx(torch_lr, rel=1e-9), f"step {step}"


def test_plateau_eps_floor():
    cfg = OptimConfig(lr=1e-7, plateau_factor=0.1, plateau_patience=0,
                      plateau_eps=1e-7)
    state = plateau_init(cfg)
    state, _ = plateau_step(state, 1.0, cfg)
    state, reduced = plateau_step(state, 1.0, cfg)
    # lr*0.9 decrement below eps -> no change (torch eps semantics)
    assert state.lr == 1e-7 and not reduced


# ------------------------------------------------------------- SGD parity


def test_sgd_momentum_matches_torch():
    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    grads = [np.random.RandomState(i + 1).randn(4, 3).astype(np.float32)
             for i in range(5)]

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([p], lr=0.01, momentum=0.99)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()

    cfg = OptimConfig(lr=0.01, momentum=0.99)
    tx = make_optimizer(cfg)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), p.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_set_learning_rate():
    tx = make_optimizer(OptimConfig(lr=0.5))
    params = jnp.zeros(3)
    state = tx.init(params)
    state = set_learning_rate(state, 0.05)
    updates, _ = tx.update(jnp.ones(3), state, params)
    np.testing.assert_allclose(np.asarray(updates), -0.05, rtol=1e-6)


def test_set_learning_rate_does_not_retrace():
    # the LR swap must preserve the hyperparameter leaf's abstract value, or
    # the first plateau drop silently recompiles the train step
    tx = make_optimizer(OptimConfig(lr=0.5))
    params = jnp.zeros(3)
    state = tx.init(params)

    @jax.jit
    def apply(state, g, params):
        return tx.update(g, state, params)

    apply(state, jnp.ones(3), params)
    n0 = apply._cache_size()
    state2 = set_learning_rate(state, 0.05)
    apply(state2, jnp.ones(3), params)
    assert apply._cache_size() == n0, "set_learning_rate retraced the step"


# ------------------------------------------------------- end-to-end fit


def test_fit_synthetic_end_to_end(tmp_path):
    # Small but real: geometry floors the network input at 380 (l=20), so use
    # a width-2 model to keep the CPU step cheap.
    data = synthetic_dataset(n_images=4, h=64, w=64, n_cells=3, crop=20, seed=0)
    ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                       weight_mode="class_balance", goal=0.999,
                       goal_direction="max")
    aug = AugmentConfig(crop=20)
    trainer = Trainer(
        ds,
        model_cfg=ModelConfig(base_width=2),
        train_cfg=TrainConfig(batch_size=2, epochs=2, checkpoint_every=1),
        aug_cfg=aug,
        loss_cfg=LossConfig(weight_mode="class_balance"),
        out_dir=str(tmp_path / "run"),
        verbose=False,
    )
    history = trainer.fit(data, data, epochs=2)
    assert len(history["loss"]) == 3  # epochs 0..2
    assert all(np.isfinite(history["loss"]))
    # progress artifact contract (reference trainer.py:178-183)
    for f in ["train_eval_iou.out", "loss.out", "loss_val.out"]:
        assert os.path.exists(tmp_path / "run" / "progress" / f)
    # checkpoints
    assert os.path.isdir(tmp_path / "run" / "models" / "latest")


def test_fit_resume(tmp_path):
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=1)
    ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                       weight_mode="class_balance", goal=0.999,
                       goal_direction="max")
    kwargs = dict(
        model_cfg=ModelConfig(base_width=2),
        train_cfg=TrainConfig(batch_size=2, epochs=1, checkpoint_every=1),
        aug_cfg=AugmentConfig(crop=20),
        loss_cfg=LossConfig(weight_mode="class_balance"),
        out_dir=str(tmp_path / "run"),
        verbose=False,
    )
    t1 = Trainer(ds, **kwargs)
    hist1 = t1.fit(data, data, epochs=1)
    # Resume continues from epoch 2 and the writer preloads epochs 0..1 from
    # metrics.jsonl (the r4 preemption fix: progress curves must span the
    # whole run, not restart at the resume point — results/r4/README.md §6),
    # so the returned history is the FULL 0..3 curve with the pre-resume
    # prefix intact.
    t2 = Trainer(ds, **kwargs)
    hist = t2.fit(data, data, epochs=3, resume=True)
    assert len(hist["loss"]) == 4  # epochs 0..3, contiguous across resume
    assert hist["loss"][:2] == pytest.approx(hist1["loss"], rel=1e-6)


def test_fit_double_resume(tmp_path):
    # VERDICT r4 item 8: resume, preempt again, resume — the curves must be
    # contiguous through BOTH resumes. The second resume preloads a
    # metrics.jsonl that itself already spans a resume, which is the case
    # the single-resume regression tests never exercised.
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=1)
    ds = DatasetConfig(name="synthetic", crop=20, metric="iou",
                       weight_mode="class_balance", goal=0.999,
                       goal_direction="max")
    kwargs = dict(
        model_cfg=ModelConfig(base_width=2),
        train_cfg=TrainConfig(batch_size=2, epochs=1, checkpoint_every=1),
        aug_cfg=AugmentConfig(crop=20),
        loss_cfg=LossConfig(weight_mode="class_balance"),
        out_dir=str(tmp_path / "run"),
        verbose=False,
    )
    hist1 = Trainer(ds, **kwargs).fit(data, data, epochs=1)
    hist2 = Trainer(ds, **kwargs).fit(data, data, epochs=3, resume=True)
    hist3 = Trainer(ds, **kwargs).fit(data, data, epochs=5, resume=True)
    assert len(hist3["loss"]) == 6  # epochs 0..5 across two resumes
    assert hist2["loss"][:2] == pytest.approx(hist1["loss"], rel=1e-6)
    assert hist3["loss"][:4] == pytest.approx(hist2["loss"], rel=1e-6)
    # the on-disk curve spans the whole run, matching in-memory history
    curve = np.loadtxt(tmp_path / "run" / "progress" / "loss.out")
    assert curve.shape == (6,)
    assert curve == pytest.approx(np.asarray(hist3["loss"]), rel=1e-6)
    # metrics.jsonl epoch numbering is contiguous (no truncation, no dupes)
    import json

    with open(tmp_path / "run" / "progress" / "metrics.jsonl") as f:
        epochs = [json.loads(line)["epoch"] for line in f]
    assert epochs == list(range(6))


def test_fit_stops_on_goal(tmp_path):
    # Goal-triggered early stopping (intended when_to_stop semantics,
    # reference trainer.py:18-28, 185-214): an immediately-satisfiable goal
    # (IoU > -1) stops training goal_patience epochs after epoch 0 and writes
    # the goal checkpoint exactly once.
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=2)
    ds = DatasetConfig(name="synthgoal", crop=20, metric="iou",
                       weight_mode="class_balance", goal=-1.0,
                       goal_direction="max")
    trainer = Trainer(
        ds,
        model_cfg=ModelConfig(base_width=2),
        train_cfg=TrainConfig(batch_size=2, epochs=10, checkpoint_every=100,
                              stop_on_goal=True, goal_patience=2),
        aug_cfg=AugmentConfig(crop=20),
        loss_cfg=LossConfig(weight_mode="class_balance"),
        out_dir=str(tmp_path / "run"),
        verbose=False,
    )
    history = trainer.fit(data, data, epochs=10)
    # epochs 0, 1, 2 ran (goal hit at 0, patience 2), then stop
    assert len(history["loss"]) == 3, history["loss"]
    goal_dir = tmp_path / "run" / "models" / "goal_synthgoal"
    assert os.path.isdir(goal_dir)


# --------------------------------------------------------- async checkpoints


def test_save_async_releases_superseded_states(tmp_path, monkeypatch):
    """Latest-wins coalescing must RELEASE superseded device states, not
    retain them in the executor queue: the round-4 recipe run exhausted TPU
    HBM at epoch ~122 because each epoch's queued save pinned a full
    params+momentum tree (~250 MB) while the ~25 s/save worker fell behind
    (results/r4/recipe_train.log, results/r4/leak_probe_C.txt)."""
    import gc
    import time
    import weakref

    from tpu_unet.train.checkpoint import Checkpointer

    class Payload:
        """Weakref-able stand-in for a device array (a pytree leaf that
        np.asarray can consume)."""

        def __array__(self, dtype=None, copy=None):
            return np.zeros(4, np.float32)

    ckpt = Checkpointer(str(tmp_path / "models"))
    orig_save = Checkpointer.save
    n_saved = []

    def slow_save(self, tag, device_state, host_state):
        time.sleep(0.05)
        n_saved.append(host_state["epoch"])
        return orig_save(self, tag, device_state, host_state)

    monkeypatch.setattr(Checkpointer, "save", slow_save)

    refs = []
    max_live = 0
    for epoch in range(40):
        p = Payload()
        refs.append(weakref.ref(p))
        ckpt.save_async("best", {"x": p}, {"epoch": epoch})
        del p
        gc.collect()
        max_live = max(max_live, sum(r() is not None for r in refs))
    ckpt.wait()
    gc.collect()

    # bounded pinning: at most the in-flight state + the pending slot (+1
    # slack for the reference the worker is mid-drop on)
    assert max_live <= 3, f"superseded states retained: {max_live} live"
    # coalescing really happened (40 submissions, worker at 50 ms each)
    assert len(n_saved) < 40
    # latest state wins
    assert n_saved[-1] == 39
    _, host = Checkpointer.restore(
        ckpt, "best", {"x": np.zeros(4, np.float32)})
    assert host["epoch"] == 39


def test_save_async_wait_reraises(tmp_path, monkeypatch):
    from tpu_unet.train.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path / "models"))

    def boom(self, tag, device_state, host_state):
        raise RuntimeError("disk full")

    monkeypatch.setattr(Checkpointer, "save", boom)
    ckpt.save_async("best", {"x": np.zeros(2)}, {"epoch": 0})
    with pytest.raises(RuntimeError, match="disk full"):
        ckpt.wait()
    # a failed drain must not wedge the checkpointer: later saves still run
    monkeypatch.undo()
    ckpt.save_async("best", {"x": np.ones(2, np.float32)}, {"epoch": 1})
    ckpt.wait()
    state, host = ckpt.restore("best", {"x": np.zeros(2, np.float32)})
    assert host["epoch"] == 1
