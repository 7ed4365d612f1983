"""The training engine: fused on-device train step + host-side epoch loop.

Capability-equivalent redesign of reference ``trainer.py:15-236`` (SURVEY.md
§2.9), with the host/device split inverted: the reference runs augmentation
and weight maps on the host *inside* the hot loop with several host<->device
crossings per step (SURVEY.md §3.1); here the jitted step consumes
device-resident data — augmentation, weight maps, loss, backward, SGD update
and metrics all fuse into one XLA program per batch.

Intended-semantics fixes over the reference (each documented at the site):
* per-epoch metrics are true means (the reference discards its accumulation,
  ``trainer.py:89``, so "Mean IoU" is the first sample only);
* the distance weight map is actually reachable (the reference's ``is``
  string comparisons make it dead code via the CLI, ``trainer.py:68``);
* goal-based saving is direction-aware (the reference compares IoU against a
  pixel-error goal for ISBI, ``trainer.py:195-204``);
* resume restores optimizer + scheduler + epoch (reference loses them);
* epoch loss is the true mean per-batch loss (the reference divides a sum of
  per-batch means by ``len(loader) * batch_size`` again, ``trainer.py:136`` —
  a pure reporting rescale; the plateau threshold is relative, so scheduler
  behaviour is unaffected).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.config import (
    AugmentConfig,
    DatasetConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
from tpu_unet.core.geometry import input_size_compute
from tpu_unet.data.augment import AugmentPipeline
from tpu_unet.data.ingest import SegmentationData, square_crop
from tpu_unet.losses import weighted_bce_with_logits
from tpu_unet.losses.metrics import batch_evaluation_metrics
from tpu_unet.losses.weights import make_weight_fn
from tpu_unet.models import UNet, center_crop_or_pad
from tpu_unet.train.checkpoint import Checkpointer
from tpu_unet.train.optimizer import (
    make_optimizer,
    plateau_init,
    plateau_step,
    set_learning_rate,
    PlateauState,
)
from tpu_unet.train.progress import ProgressWriter


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_train_step(model: UNet, weight_fn, broadcast: str, tx):
    """One fused SGD step: weights -> loss -> grads -> update -> metrics."""

    @jax.jit
    def step(state: TrainState, inp: jax.Array, gt: jax.Array):
        weights = weight_fn(gt)

        def loss_fn(params):
            logits = model.apply(params, inp)
            logits = center_crop_or_pad(logits, gt.shape[1:3])
            return weighted_bce_with_logits(logits, gt, weights, broadcast), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        metrics = batch_evaluation_metrics(preds, gt)
        return TrainState(params, opt_state), loss, metrics

    return step


def make_eval_step(model: UNet, weight_fn, broadcast: str):
    """Whole-image evaluation: forward mirror-padded input, center-crop logits
    to the label window, loss + per-sample metrics (reference val loop,
    ``trainer.py:95-128``)."""

    @jax.jit
    def step(params, inp: jax.Array, gt: jax.Array):
        logits = model.apply(params, inp)
        logits = center_crop_or_pad(logits, gt.shape[1:3])
        weights = weight_fn(gt)
        # per-sample losses so padded tail batches can be trimmed exactly
        loss = weighted_bce_with_logits(logits, gt, weights, broadcast,
                                        reduction="per_sample")
        preds = jnp.argmax(logits, axis=-1)
        return loss, batch_evaluation_metrics(preds, gt)

    return step


def prepare_eval_arrays(data: SegmentationData) -> Tuple[np.ndarray, np.ndarray]:
    """Host prep of whole-image eval inputs, reference ``data.py:169-191``:
    square-crop non-square frames, mirror-pad to the network input size,
    min/ptp-normalize; labels binarized to {0,1}."""
    from tpu_unet.ops.pad import reflect_pad  # jax op usable on host arrays

    inputs, labels = [], []
    for img, tgt in zip(data.images, data.targets):
        img, tgt = square_crop(img, tgt)
        _, input_size, _ = input_size_compute(img.shape[-1])
        pad = (input_size - img.shape[-1]) // 2
        padded = np.asarray(reflect_pad(jnp.asarray(img), pad))
        padded = (padded - padded.min()) / max(np.ptp(padded), 1e-12)
        inputs.append(padded.astype(np.float32))
        labels.append((tgt > 127).astype(np.int32))
    return np.stack(inputs)[..., None], np.stack(labels)


@dataclasses.dataclass
class EpochStats:
    loss: float
    iou: float
    pixel_error: float


class Trainer:
    """End-to-end training for one fold/run."""

    def __init__(
        self,
        dataset_cfg: DatasetConfig,
        model_cfg: ModelConfig = ModelConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        loss_cfg: Optional[LossConfig] = None,
        aug_cfg: Optional[AugmentConfig] = None,
        out_dir: str = "runs/default",
        verbose: bool = True,
        nan_check: bool = False,
    ):
        self.dataset_cfg = dataset_cfg
        # The split concat-conv trains as-is: its custom VJP routes the
        # backward through the concat form's transposes, dodging the XLA TPU
        # space-to-batch assert its autodiff backward used to trip at small
        # batch (models/unet.py::split_concat_conv3x3).
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.loss_cfg = loss_cfg or dataset_cfg.loss()
        self.aug_cfg = aug_cfg or dataset_cfg.augment()
        self.out_dir = out_dir
        self.verbose = verbose
        self.nan_check = nan_check

        self.model = UNet(model_cfg)
        self.weight_fn = make_weight_fn(
            self.loss_cfg.weight_mode,
            **(dict(w0=self.loss_cfg.w0, sigma2=self.loss_cfg.sigma2,
                    max_objects=self.loss_cfg.max_objects)
               if self.loss_cfg.weight_mode == "distance" else {}),
        )
        self.tx = make_optimizer(train_cfg.optim)
        self.pipe = AugmentPipeline(self.aug_cfg)
        self.train_step = make_train_step(
            self.model, self.weight_fn, self.loss_cfg.weight_broadcast, self.tx
        )
        self.eval_step = make_eval_step(
            self.model, self.weight_fn, self.loss_cfg.weight_broadcast
        )
        # Whole-epoch engine: lax.scan over the epoch's batches inside ONE
        # compiled graph. A host-side per-batch loop costs 2-3 dispatches
        # per step; on a remote/tunneled backend each dispatch can pay the
        # transport roundtrip, which at ~33 ms is 2-3x the whole fused
        # step's device time (results/r3/bench_train_r3c.log: 69.3 ms/step
        # measured vs 22.7 ms device). On local hardware dispatch is ~50 us
        # and this is neutral; either way the epoch is device-resident.
        self._run_epoch = jax.jit(self._epoch_scan)

    def _epoch_scan(self, state, images, targets, log_probs, pairs,
                    order, keys):
        """[n_batches] scanned train steps; returns (state, losses
        [n_batches], metrics [n_batches * bs, k])."""

        def body(st, xs):
            idx, key = xs
            inp, gt = self.pipe._fn(images, targets, log_probs, pairs,
                                    idx, key)
            st, loss, metrics = self.train_step(st, inp, gt)
            return st, (loss, metrics)

        state, (losses, metrics) = jax.lax.scan(body, state, (order, keys))
        return state, losses, metrics.reshape(-1, metrics.shape[-1])

    # ------------------------------------------------------------- helpers

    def init_state(self, rng: jax.Array) -> TrainState:
        s = self.aug_cfg.input_size
        sample = jnp.zeros((1, s, s, 1), jnp.float32)
        params = self.model.init(rng, sample)
        return TrainState(params, self.tx.init(params))

    def _log(self, *args):
        if self.verbose:
            print(*args, flush=True)

    # ------------------------------------------------------------------ fit

    def fit(
        self,
        train_data: SegmentationData,
        val_data: SegmentationData,
        epochs: Optional[int] = None,
        resume: bool = False,
    ) -> Dict[str, List[float]]:
        cfg = self.train_cfg
        epochs = cfg.epochs if epochs is None else epochs
        bs = cfg.batch_size
        ckpt = Checkpointer(os.path.join(self.out_dir, "models"))

        # Preemption handling (SURVEY.md §5.3 — absent in the reference):
        # SIGTERM/SIGINT set a flag; the loop checkpoints 'latest' at the next
        # epoch boundary and exits cleanly, so `fit(resume=True)` continues.
        preempted = {"flag": False}
        prev_handlers = {}
        import signal as _signal

        def _on_signal(signum, frame):
            preempted["flag"] = True

        try:
            for sig in (_signal.SIGTERM, _signal.SIGINT):
                prev_handlers[sig] = _signal.signal(sig, _on_signal)
        except ValueError:
            prev_handlers = {}  # not in main thread; skip

        # Device-resident stacks.
        images = jnp.asarray(train_data.images)
        targets = jnp.asarray(train_data.targets)
        log_probs = jnp.asarray(train_data.crop_log_probs)
        pairs = jnp.asarray(train_data.crop_pairs)
        val_inp, val_gt = prepare_eval_arrays(val_data)
        val_inp, val_gt = jnp.asarray(val_inp), jnp.asarray(val_gt)

        rng = jax.random.PRNGKey(cfg.seed)
        state = self.init_state(jax.random.fold_in(rng, 0xBEEF))
        plateau = plateau_init(cfg.optim)
        best_val_loss = float("inf")
        goal_saved = False
        goal_epoch: Optional[int] = None
        epoch0 = 0
        last_best_save = -(10 ** 9)

        if resume and ckpt.exists("latest"):
            state_restored, host = ckpt.restore("latest", state)
            state = TrainState(*state_restored)
            plateau = PlateauState(**host["plateau"])
            best_val_loss = host["best_val_loss"]
            goal_saved = host.get("goal_saved", False)
            goal_epoch = host.get("goal_epoch")
            if goal_saved and goal_epoch is None:
                # checkpoint from before goal_epoch existed: the goal was
                # hit at or before the saved epoch — anchor the stop_on_goal
                # patience there instead of disabling it forever
                goal_epoch = host["epoch"]
            epoch0 = host["epoch"] + 1
            self._log(f"Resumed from epoch {host['epoch']}")

        # Constructed after resume so a resumed run preloads the completed
        # epochs' curves (epochs 0..epoch0-1) instead of truncating them.
        prog = ProgressWriter(self.out_dir, resume_epochs=epoch0)

        perm_rng = np.random.RandomState(cfg.seed)
        n = len(train_data)
        stop = False

        for epoch in range(epoch0, epochs + 1):
            t0 = time.time()
            # Plateau-scheduled LR into the optimizer state.
            state = TrainState(state.params,
                               set_learning_rate(state.opt_state, plateau.lr))

            order = perm_rng.permutation(n)
            if n < bs:  # tiny dataset: wrap around to fill one batch
                order = np.resize(order, bs)
            n_batches = max(1, len(order) // bs)
            order = order[: n_batches * bs].reshape(n_batches, bs)
            # One host->device upload per epoch; the whole epoch then runs
            # as a single scanned graph (see _epoch_scan).
            order_dev = jnp.asarray(order, jnp.int32)
            keys = jax.vmap(
                lambda b: jax.random.fold_in(rng, epoch * 1_000_003 + b)
            )(jnp.arange(n_batches))

            state, losses, metrics = self._run_epoch(
                state, images, targets, log_probs, pairs, order_dev, keys)
            train_loss = float(jnp.mean(losses))
            train_metrics = np.asarray(metrics)
            if self.nan_check and not np.isfinite(train_loss):
                raise FloatingPointError(f"non-finite training loss at epoch {epoch}")
            train_stats = EpochStats(
                train_loss,
                float(np.nanmean(train_metrics[:, 0])),
                float(np.mean(train_metrics[:, 1])),
            )

            val_stats = self.evaluate_arrays(state.params, val_inp, val_gt, bs)

            plateau, _ = plateau_step(plateau, val_stats.loss, cfg.optim)

            improved = val_stats.loss < best_val_loss * (1.0 - cfg.optim.plateau_threshold)
            if improved:
                best_val_loss = val_stats.loss
            host = {
                "epoch": epoch,
                "plateau": plateau._asdict(),
                "best_val_loss": best_val_loss,
                "goal_saved": goal_saved,
                "goal_epoch": goal_epoch,
                # self-describing checkpoints: TESTING rebuilds the exact model
                "model_cfg": dataclasses.asdict(self.model_cfg),
            }
            if improved:
                if epoch - last_best_save >= cfg.best_save_min_interval:
                    ckpt.save_async("best", state, host)
                    last_best_save = epoch
                self._log(f"Epoch {epoch}: new best (val loss {val_stats.loss:.6f})")

            # Goal-based save (direction-aware; reference trainer.py:185-214).
            goal_metric = (val_stats.iou if self.dataset_cfg.metric == "iou"
                           else val_stats.pixel_error)
            hit = (goal_metric > self.dataset_cfg.goal
                   if self.dataset_cfg.goal_direction == "max"
                   else goal_metric < self.dataset_cfg.goal)
            if hit and not goal_saved:
                goal_saved = True
                goal_epoch = epoch
                host["goal_saved"] = True
                host["goal_epoch"] = goal_epoch
                ckpt.save_async(f"goal_{self.dataset_cfg.name}", state, host)
                self._log(f"Epoch {epoch}: paper goal reached "
                          f"({goal_metric:.4f} vs {self.dataset_cfg.goal})")

            # Goal-triggered early stop (intended when_to_stop semantics).
            if (cfg.stop_on_goal and goal_epoch is not None
                    and epoch - goal_epoch >= cfg.goal_patience):
                self._log(f"Goal reached at epoch {goal_epoch}; stopping "
                          f"after goal_patience={cfg.goal_patience}")
                stop = True

            if epoch % cfg.checkpoint_every == 0:
                ckpt.save_async("latest", state, host)

            prog.append(
                loss=train_stats.loss, loss_val=val_stats.loss,
                train_iou=train_stats.iou, train_pe=train_stats.pixel_error,
                val_iou=val_stats.iou, val_pe=val_stats.pixel_error,
            )
            self._log(
                f"Epoch {epoch:4d} lr {plateau.lr:.2e} "
                f"loss {train_stats.loss:.5f}/{val_stats.loss:.5f} "
                f"IoU {train_stats.iou:.4f}/{val_stats.iou:.4f} "
                f"PE {train_stats.pixel_error:.4f}/{val_stats.pixel_error:.4f} "
                f"patience {plateau.num_bad_epochs}/{cfg.optim.plateau_patience} "
                f"{time.time() - t0:.1f}s"
            )

            # LR-floor early stop (reference trainer.py:223-231).
            if (plateau.lr < 10 * cfg.optim.plateau_eps
                    and plateau.num_bad_epochs >= cfg.optim.plateau_patience):
                self._log(f"LR below floor at epoch {epoch}; stopping")
                stop = True

            if preempted["flag"]:
                self._log(f"Preemption signal at epoch {epoch}: "
                          f"checkpointing 'latest' and exiting cleanly")
                stop = True

            if stop or epoch == epochs:
                ckpt.save_async("latest", state, host)
            if stop:
                break

        ckpt.wait()
        for sig, handler in prev_handlers.items():
            _signal.signal(sig, handler)
        if preempted["flag"] and prev_handlers:
            # Re-deliver so callers/orchestrators observe the interruption.
            raise KeyboardInterrupt("training preempted (state checkpointed)")
        self.final_state = state
        return prog.history

    # ----------------------------------------------------------------- eval

    def evaluate_arrays(self, params, val_inp: jax.Array, val_gt: jax.Array,
                        batch_size: int) -> EpochStats:
        n = val_inp.shape[0]
        losses, metrics = [], []
        i = 0
        while i < n:
            j = min(i + batch_size, n)
            # keep batch shape static: pad the tail by repetition, trim the
            # duplicated samples from both metrics AND per-sample losses (an
            # equal-weight mean of batch losses would bias the plateau
            # scheduler whenever n % batch_size != 0)
            take = jnp.arange(i, i + batch_size) % n if j - i < batch_size else None
            if take is None:
                li, mi = self.eval_step(params, val_inp[i:j], val_gt[i:j])
                metrics.append(np.asarray(mi))
                losses.append(np.asarray(li))
            else:
                li, mi = self.eval_step(params, val_inp[take], val_gt[take])
                metrics.append(np.asarray(mi)[: n - i])
                losses.append(np.asarray(li)[: n - i])
            i = j
        m = np.concatenate(metrics, 0)
        return EpochStats(float(np.mean(np.concatenate(losses))),
                          float(np.nanmean(m[:, 0])),
                          float(np.mean(m[:, 1])))
