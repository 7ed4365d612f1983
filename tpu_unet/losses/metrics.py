"""Evaluation metrics: IoU and pixel error, as jitted device reductions.

Bit-faithful to reference ``functions.py:150-213``:
* IoU = |pred AND label| / |pred OR label| over nonzero masks (194-213).
* Pixel error = mean(|pred - label|) (174-190).
* ``evaluation_metrics`` bundles them as a length-2 vector [iou, pe] (150-170).

The reference accumulates these per *sample* but its ``np.concatenate`` results
are discarded (``trainer.py:89``, SURVEY.md §2.9) so its epoch means are the
first sample only; here per-sample metrics are returned and genuinely averaged
by the training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou(pred: jax.Array, label: jax.Array) -> jax.Array:
    """Intersection-over-union of nonzero masks. Returns NaN when both masks
    are empty (0/0), matching the reference's numpy division semantics."""
    p = pred != 0
    l = label != 0
    inter = jnp.sum(jnp.logical_and(p, l))
    union = jnp.sum(jnp.logical_or(p, l))
    return inter.astype(jnp.float32) / union.astype(jnp.float32)


def pixel_error(pred: jax.Array, label: jax.Array) -> jax.Array:
    """Mean absolute difference between prediction and label masks."""
    diff = jnp.abs(pred.astype(jnp.float32) - label.astype(jnp.float32))
    return jnp.mean(diff)


def evaluation_metrics(pred: jax.Array, label: jax.Array) -> jax.Array:
    """[2] vector of (iou, pixel_error) for one sample."""
    return jnp.stack([iou(pred, label), pixel_error(pred, label)])


def batch_evaluation_metrics(preds: jax.Array, labels: jax.Array) -> jax.Array:
    """[B, 2] per-sample (iou, pixel_error) over a batch."""
    return jax.vmap(evaluation_metrics)(preds, labels)
