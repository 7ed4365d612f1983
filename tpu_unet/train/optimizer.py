"""Optimizer and LR scheduling.

Reference (``trainer.py:30-31``): ``optim.SGD(lr=1e-4, momentum=0.99)`` +
``ReduceLROnPlateau(mode='min', factor=0.1, patience=30, threshold=1e-3,
threshold_mode='rel', eps=1e-7)`` stepped on per-epoch validation loss.

* SGD+momentum: ``optax.sgd`` with ``optax.inject_hyperparams`` so the
  plateau-scheduled learning rate is a mutable hyperparameter inside the
  jitted step (torch semantics: buf = mu*buf + grad; p -= lr*buf — identical
  to optax's trace with nesterov=False, no dampening).
* ReduceLROnPlateau: a pure functional port of the torch scheduler (state in,
  state out) so it checkpoints/restores exactly — unlike the reference, which
  loses scheduler state on resume (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import optax

from tpu_unet.config import OptimConfig


class PlateauState(NamedTuple):
    """Functional ReduceLROnPlateau (torch semantics, mode='min')."""

    lr: float
    best: float
    num_bad_epochs: int
    cooldown_counter: int


def plateau_init(cfg: OptimConfig) -> PlateauState:
    return PlateauState(lr=cfg.lr, best=float("inf"), num_bad_epochs=0,
                        cooldown_counter=0)


def _is_better(metric: float, best: float, cfg: OptimConfig) -> bool:
    if cfg.plateau_threshold_mode == "rel":
        return metric < best * (1.0 - cfg.plateau_threshold)
    return metric < best - cfg.plateau_threshold


def plateau_step(state: PlateauState, metric: float, cfg: OptimConfig,
                 cooldown: int = 0) -> Tuple[PlateauState, bool]:
    """One scheduler step on the epoch metric. Returns (new_state, reduced)."""
    lr = state.lr
    best = state.best
    num_bad = state.num_bad_epochs
    cd = state.cooldown_counter

    if _is_better(metric, best, cfg):
        best = metric
        num_bad = 0
    else:
        num_bad += 1

    if cd > 0:
        cd -= 1
        num_bad = 0

    reduced = False
    if num_bad > cfg.plateau_patience:
        new_lr = lr * cfg.plateau_factor
        if lr - new_lr > cfg.plateau_eps:
            lr = new_lr
            reduced = True
        cd = cooldown
        num_bad = 0

    return PlateauState(lr=lr, best=best, num_bad_epochs=num_bad,
                        cooldown_counter=cd), reduced


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """SGD with momentum and injectable learning rate."""
    return optax.inject_hyperparams(optax.sgd)(
        learning_rate=cfg.lr, momentum=cfg.momentum
    )


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in an optimizer state (host or jit).

    The LR is carried as an f32 array matching the existing hyperparameter
    leaf's dtype/weak-type: a raw Python float would change the leaf's abstract
    value and silently retrace the jitted train step on the first plateau drop
    (VERDICT r1 weak-5)."""
    import jax.numpy as jnp

    hp = dict(opt_state.hyperparams)
    prev = hp["learning_rate"]
    hp["learning_rate"] = jnp.asarray(lr, dtype=getattr(prev, "dtype",
                                                        jnp.float32))
    return opt_state._replace(hyperparams=hp)
