"""Spatial (strip) parallelism with halo exchange — the convnet counterpart
of sequence/context parallelism (SURVEY.md §2.14, §5.7).

One large image is sharded by rows across the ``spatial`` mesh axis. Each
device computes the valid U-Net output for its strip; the 3x3 valid convs
need ``context/2`` (= 92 for depth 4) rows of receptive-field halo on each
side, exchanged with ring neighbours via ``lax.ppermute`` inside
``shard_map``. Edge devices mirror-pad locally instead (they own the image
border, so the reflection is exact). Columns are fully resident per device
and mirror-padded locally.

Constraints (asserted): strip height must be a valid U-Net *output* size
(strip + context is then a valid input size), and >= context/2 so a single
ring hop supplies the halo.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_unet.core.geometry import CONTEXT, output_size_for_input


def _mirror_rows_top(strip: jax.Array, pad: int) -> jax.Array:
    """First `pad` rows of np.pad(strip, reflect) above row 0: rows pad..1."""
    return strip[1:pad + 1][::-1]


def _mirror_rows_bottom(strip: jax.Array, pad: int) -> jax.Array:
    return strip[-pad - 1:-1][::-1]


def _halo_forward_local(model, params, strip, axis: str, n: int, pad: int):
    """Shared shard-local forward: exchange row halos with ring neighbours
    (mirror at the edges), mirror columns locally, run the network.
    strip [s, W] -> logits [s, W, C]."""
    i = lax.axis_index(axis)
    fwd_perm = [(j, j + 1) for j in range(n - 1)]   # send downward
    bwd_perm = [(j + 1, j) for j in range(n - 1)]   # send upward
    from_above = lax.ppermute(strip[-pad:], axis, fwd_perm)
    from_below = lax.ppermute(strip[:pad], axis, bwd_perm)
    top = jnp.where(i == 0, _mirror_rows_top(strip, pad), from_above)
    bottom = jnp.where(i == n - 1, _mirror_rows_bottom(strip, pad), from_below)
    x = jnp.concatenate([top, strip, bottom], axis=0)
    cols = jnp.concatenate(
        [x[:, 1:pad + 1][:, ::-1], x, x[:, -pad - 1:-1][:, ::-1]], axis=1
    )
    return model.apply(params, cols[None, :, :, None])[0]


def make_halo_train_step(model, tx, mesh: Mesh, strip_h: int, width: int,
                         axis: str = "spatial"):
    """Spatially-sharded training step for images too large for one chip:
    one sample's rows are sharded over `axis`; the forward exchanges
    receptive-field halos via ppermute, the loss uses class-balance weights
    with *global* class counts (psum), and gradients flow back through the
    halo exchange (ppermute transposes to the reverse permute) with the
    parameter gradient all-reduce inserted automatically by shard_map's
    unmapped-argument transpose.

    Distance-transform weights are not supported in this mode (the exact EDT
    is a global computation; use crop-based DP training for that workload —
    SURVEY.md §2.14 positions spatial sharding as the large-image analog of
    context parallelism).

    Returns step(state, image [n*strip_h, width] sharded by rows,
    labels [n*strip_h, width] i32 sharded by rows) ->
    (state, loss, (iou, pixel_error)) with scalars replicated.
    """
    from tpu_unet.losses.bce import one_hot_targets
    from tpu_unet.train.trainer import TrainState

    pad = CONTEXT // 2
    n = mesh.shape[axis]
    output_size_for_input(strip_h + CONTEXT)
    output_size_for_input(width + CONTEXT)
    if strip_h <= pad:
        raise ValueError(f"strip height {strip_h} <= halo {pad}")

    def shard_loss(params, strip, gt_strip):
        logits = _halo_forward_local(model, params, strip, axis, n, pad)
        y = gt_strip.astype(jnp.float32)
        n_cell = lax.psum(jnp.sum(y), axis)
        n_bg = lax.psum(jnp.sum(1.0 - y), axis)
        bg_w = jnp.where(n_bg > 0, n_cell / jnp.maximum(n_bg, 1.0), 1.0)
        bg_w = jnp.where((n_cell > 0) & (n_bg > 0), bg_w, 1.0)
        w = jnp.where(gt_strip != 0, 1.0, bg_w)[..., None]
        z = one_hot_targets(gt_strip[None])[0]
        x = logits.astype(jnp.float32)
        bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
        loss_sum = lax.psum(jnp.sum(w * bce), axis)
        count = lax.psum(jnp.asarray(bce.size, jnp.float32), axis)
        # per-shard metric partials (exact global IoU / pixel error)
        pred = jnp.argmax(logits, axis=-1)
        inter = lax.psum(jnp.sum((pred != 0) & (gt_strip != 0)), axis)
        union = lax.psum(jnp.sum((pred != 0) | (gt_strip != 0)), axis)
        pe = lax.psum(jnp.sum(jnp.abs(pred - gt_strip)), axis)
        npx = lax.psum(jnp.asarray(pred.size, jnp.float32), axis)
        aux = (inter.astype(jnp.float32) / union.astype(jnp.float32),
               pe.astype(jnp.float32) / npx)
        return loss_sum / count, aux

    def loss_fn(params, image, labels):
        f = shard_map(
            lambda p, s, g: shard_loss(p, s, g),
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis, None)),
            out_specs=(P(), (P(), P())),
            check_vma=False,
        )
        return f(params, image, labels)

    def step(state, image, labels):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, image, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda a, u: a + u, state.params, updates)
        return TrainState(params, opt_state), loss, aux

    return jax.jit(step)


def make_dp_halo_train_step(model, tx, mesh: Mesh, strip_h: int, width: int,
                            data_axis: str = "data",
                            spatial_axis: str = "spatial"):
    """Composed 2D-mesh training (BASELINE configs 4+5 combined): a batch of
    large images sharded on `data`, each image's rows simultaneously sharded
    on `spatial` with ppermute halo exchange.

    Per-sample class-balance weights use *per-image* global counts (psum over
    the spatial axis only); the loss/gradient mean couples both axes, so
    shard_map's transpose inserts the parameter-grad psum over the full 2D
    mesh. Inputs: images [B, n_s*strip_h, width] f32 and labels (same shape,
    i32), both sharded P(data, spatial, None). Returns
    (state, loss, (mean IoU, mean pixel error)) with replicated scalars.
    """
    from tpu_unet.losses.bce import one_hot_targets
    from tpu_unet.train.trainer import TrainState

    pad = CONTEXT // 2
    n_s = mesh.shape[spatial_axis]
    n_d = mesh.shape[data_axis]
    output_size_for_input(strip_h + CONTEXT)
    output_size_for_input(width + CONTEXT)
    if strip_h <= pad:
        raise ValueError(f"strip height {strip_h} <= halo {pad}")

    def shard_loss(params, strips, gts):
        # strips: [b_loc, strip_h, width] — this device's rows of its
        # local batch shard. The named-axis collectives inside the
        # per-sample forward batch cleanly under vmap.
        fwd = lambda s: _halo_forward_local(model, params, s, spatial_axis,
                                            n_s, pad)
        logits = jax.vmap(fwd)(strips)                      # [b, s, W, C]
        y = gts.astype(jnp.float32)
        n_cell = lax.psum(jnp.sum(y, axis=(1, 2)), spatial_axis)        # [b]
        n_bg = lax.psum(jnp.sum(1.0 - y, axis=(1, 2)), spatial_axis)    # [b]
        bg_w = jnp.where(n_bg > 0, n_cell / jnp.maximum(n_bg, 1.0), 1.0)
        bg_w = jnp.where((n_cell > 0) & (n_bg > 0), bg_w, 1.0)
        w = jnp.where(gts != 0, 1.0, bg_w[:, None, None])[..., None]
        z = one_hot_targets(gts)
        x = logits.astype(jnp.float32)
        bce = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
        axes = (data_axis, spatial_axis)
        loss_sum = lax.psum(jnp.sum(w * bce), axes)
        count = lax.psum(jnp.asarray(bce.size, jnp.float32), axes)
        # per-sample IoU / pixel error (global over each image's rows),
        # then mean over the global batch.
        pred = jnp.argmax(logits, axis=-1)
        inter = lax.psum(jnp.sum((pred != 0) & (gts != 0), axis=(1, 2)),
                         spatial_axis).astype(jnp.float32)
        union = lax.psum(jnp.sum((pred != 0) | (gts != 0), axis=(1, 2)),
                         spatial_axis).astype(jnp.float32)
        pe = lax.psum(jnp.sum(jnp.abs(pred - gts), axis=(1, 2)),
                      spatial_axis).astype(jnp.float32)
        npx = jnp.asarray(n_s * strip_h * width, jnp.float32)
        b_global = jnp.asarray(strips.shape[0] * n_d, jnp.float32)
        iou_m = lax.psum(jnp.sum(inter / jnp.maximum(union, 1.0)),
                         data_axis) / b_global
        pe_m = lax.psum(jnp.sum(pe / npx), data_axis) / b_global
        return loss_sum / count, (iou_m, pe_m)

    def loss_fn(params, images, labels):
        f = shard_map(
            shard_loss,
            mesh=mesh,
            in_specs=(P(), P(data_axis, spatial_axis, None),
                      P(data_axis, spatial_axis, None)),
            out_specs=(P(), (P(), P())),
            check_vma=False,
        )
        return f(params, images, labels)

    def step(state, images, labels):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda a, u: a + u, state.params, updates)
        return TrainState(params, opt_state), loss, aux

    return jax.jit(step)


def halo_strip_inference(model, mesh: Mesh, strip_h: int, width: int,
                         axis: str = "spatial"):
    """Build a sharded whole-image forward: image [n*strip_h, width] f32
    (already normalized) -> class logits [n*strip_h, width, C].

    The image must be sharded by rows over `axis`; output comes back sharded
    the same way.
    """
    pad = CONTEXT // 2
    n = mesh.shape[axis]
    # strip + context must be a valid input size; raises otherwise.
    output_size_for_input(strip_h + CONTEXT)
    output_size_for_input(width + CONTEXT)
    if strip_h <= pad:
        raise ValueError(
            f"strip height {strip_h} <= halo {pad}: single-hop ppermute cannot "
            f"supply the receptive field (and edge mirrors need pad+1 rows); "
            f"use fewer devices or larger strips")

    def strip_fn(params, strip):
        # strip: [strip_h, width] — this device's rows.
        return _halo_forward_local(model, params, strip, axis, n, pad)

    sharded = shard_map(
        strip_fn,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)
