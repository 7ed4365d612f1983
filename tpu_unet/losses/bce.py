"""Per-pixel weighted binary cross-entropy with logits.

Matches ``torch.nn.BCEWithLogitsLoss(weight=w)`` (mean reduction) as used by
the reference training step (``trainer.py:63-75``): per-channel sigmoid BCE
over a 2-channel one-hot target — *not* softmax cross-entropy (SURVEY.md §2.9).

Two weight-broadcast modes:

* ``intended``: pixel (b, i, j) of every class channel is weighted by sample
  b's weight map — what the reference authors meant.
* ``parity``: reproduces the reference's accidental broadcast. The torch call
  passes weight [B, H, W] against input [B, 2, H, W]; right-aligned
  broadcasting consumes it as [1, B, H, W], so sample i / channel j is
  weighted by sample j's map. Only well-formed when batch == num_classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_targets(labels: jax.Array) -> jax.Array:
    """[B, h, w] int {0,1} -> [B, h, w, 2] float one-hot.

    Channel 0 = background (1 - y), channel 1 = cell (y), matching the
    reference's ``ll`` construction (``trainer.py:63-66``).
    """
    y = labels.astype(jnp.float32)
    return jnp.stack([1.0 - y, y], axis=-1)


def weighted_bce_with_logits(
    logits: jax.Array,
    labels: jax.Array,
    weights: jax.Array,
    broadcast: str = "intended",
    reduction: str = "mean",
) -> jax.Array:
    """Mean of w * BCE(logits, one_hot(labels)) over all elements.

    logits:  [B, h, w, C] f32 (C = 2)
    labels:  [B, h, w] int in {0, 1}
    weights: [B, h, w] f32 per-pixel weight map
    reduction: 'mean' -> scalar; 'per_sample' -> [B] per-sample means (the
    overall mean equals the mean of these — equal pixel counts per sample).
    """
    targets = one_hot_targets(labels)
    # Numerically stable elementwise BCE-with-logits:
    #   max(x, 0) - x*z + log(1 + exp(-|x|))
    x = logits.astype(jnp.float32)
    z = targets
    bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))

    if broadcast == "intended":
        w = weights[..., None]                      # [B, h, w, 1] -> all channels
    elif broadcast == "parity":
        if logits.shape[0] != logits.shape[-1]:
            raise ValueError(
                "parity broadcast requires batch == num_classes "
                f"(got batch={logits.shape[0]}, classes={logits.shape[-1]}); "
                "this reproduces the reference's [B,H,W] weight against "
                "[B,2,H,W] input (trainer.py:70)"
            )
        # weight[b, i, j] consumed as channel index: eff[b', i, j, c] = w[c, i, j]
        w = jnp.moveaxis(weights, 0, -1)[None]      # [1, h, w, B=C]
    else:
        raise ValueError(f"unknown broadcast mode: {broadcast}")

    if reduction == "per_sample":
        return jnp.mean(jnp.broadcast_to(w, bce.shape) * bce, axis=(1, 2, 3))
    if reduction != "mean":
        raise ValueError(f"unknown reduction: {reduction}")
    return jnp.mean(w * bce)
