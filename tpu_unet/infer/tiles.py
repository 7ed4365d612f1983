"""Overlap-tile inference engine.

The paper's overlap-tile strategy (Ronneberger et al. Fig. 2): tile the output
domain, mirror-pad each tile's receptive-field context, run the valid-conv
network per tile, stitch. The reference only *approximates* this with a single
whole-image mirrored pass (``data.py:169-191``, ``tester.py:27-30``;
SURVEY.md §2.3) — constant memory in image size is lost and large images OOM.

Here:
* geometry comes from core.geometry.plan_tiles (tile origins are static, so
  the whole predict function traces into one XLA program: pad -> gather tiles
  -> batched forward -> scatter-stitch);
* tiles are batched (`batch_tiles`) to keep the MXU fed; with `tile_out` >=
  image size the engine degenerates to exactly the reference's whole-image
  pass (one tile), used for behaviour-parity evaluation;
* a multi-image entry point feeds the throughput path (BASELINE target:
  >= 1000 512x512 tiles/s/chip on v5e).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.core.geometry import TilePlan, input_size_compute, plan_tiles
from tpu_unet.models import center_crop_or_pad
from tpu_unet.ops.pad import reflect_pad


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TileInference:
    """Jitted overlap-tile predictor for a fixed image shape."""

    def __init__(self, model, image_h: int, image_w: int,
                 tile_out: Optional[int] = None, batch_tiles: int = 8,
                 normalize: bool = True, mesh=None, mesh_axis: str = "data",
                 apply_fn=None):
        """tile_out=None picks the whole-image single-tile plan (reference
        behaviour-parity: ``data.py:184`` mirror pad + one forward); an
        (h, w) pair plans rectangular STRIP tiles (round-3 serving
        formulation: tall strips share halo context between the square
        tiles they cover — core.geometry.plan_tiles).

        `mesh`: a jax.sharding.Mesh — tile batches are sharded over
        `mesh_axis` so one image's overlap tiles spread across the slice
        (BASELINE config 4: tiles batched across a TPU mesh). batch_tiles is
        rounded up to a multiple of the axis size.

        `apply_fn(params, tiles) -> logits` overrides the model forward for
        the tile batches — e.g. a QuantInference int8 serving forward
        (infer/quant.py; params already baked in are simply ignored)."""
        self.model = model
        self.apply_fn = apply_fn
        if tile_out is None:
            tile_out = input_size_compute(max(image_h, image_w))[2]
        self.plan: TilePlan = plan_tiles(image_h, image_w, tile_out)
        self.batch_tiles = min(batch_tiles, self.plan.num_tiles)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None:
            n = mesh.shape[mesh_axis]
            self.batch_tiles = max(n, _round_up(self.batch_tiles, n))
        self.normalize = normalize
        self._predict = jax.jit(partial(self._predict_impl))

    def _predict_impl(self, params, image: jax.Array) -> jax.Array:
        """image [H, W] f32 -> logits [H, W, C]."""
        p = self.plan
        if self.normalize:
            # guard: a constant image has ptp 0 -> NaN logits otherwise
            image = (image - jnp.min(image)) / jnp.maximum(jnp.ptp(image), 1e-12)
        padded = reflect_pad(
            image,
            ((p.pad, p.pad + p.canvas_h - p.image_h),
             (p.pad, p.pad + p.canvas_w - p.image_w)),
        )
        ti_h, ti_w = p.tile_in_hw
        tiles = jnp.stack(
            [padded[y:y + ti_h, x:x + ti_w] for (y, x) in p.origins]
        )[..., None]                                   # [T, ti_h, ti_w, 1]

        t = p.num_tiles
        b = self.batch_tiles
        n_chunks = -(-t // b)
        pad_t = n_chunks * b - t
        if pad_t:
            tiles = jnp.concatenate([tiles, tiles[:pad_t]], axis=0)
        chunks = tiles.reshape(n_chunks, b, ti_h, ti_w, 1)

        def fwd(tile_batch):
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                tile_batch = jax.lax.with_sharding_constraint(
                    tile_batch,
                    NamedSharding(self.mesh, P(self.mesh_axis)))
            if self.apply_fn is not None:
                logits = self.apply_fn(params, tile_batch)
            else:
                logits = self.model.apply(params, tile_batch)
            return center_crop_or_pad(logits, p.tile_out_hw)

        to_h, to_w = p.tile_out_hw
        if n_chunks == 1:
            out = fwd(chunks[0])[None]
        else:
            out = jax.lax.map(fwd, chunks)             # [n_chunks, b, toh, tow, C]
        out = out.reshape(n_chunks * b, to_h, to_w, -1)[:t]

        canvas = jnp.zeros((p.canvas_h, p.canvas_w, out.shape[-1]), out.dtype)
        for i, (y, x) in enumerate(p.out_origins):
            canvas = jax.lax.dynamic_update_slice(canvas, out[i], (y, x, 0))
        return canvas[: p.image_h, : p.image_w]

    def predict_logits(self, params, image) -> jax.Array:
        """[H, W] -> [H, W, C] logits."""
        return self._predict(params, jnp.asarray(image, jnp.float32))

    def predict(self, params, image) -> jax.Array:
        """[H, W] -> [H, W] int32 class map (argmax, reference tester.py:30)."""
        return jnp.argmax(self.predict_logits(params, image), axis=-1)

    # Flat-batch serving path (r5 attribution, results/r5/tiled_attrib.txt):
    # vmapping the per-image forward nests the batch (N images x T-tile
    # chunks) and XLA lowers the nested form at ~208 tiles/s where the SAME
    # tiles as one flat batch-16 run at ~350+. The fused eval/predict paths
    # therefore gather tiles across ALL images, run flat chunks of
    # _FLAT_CHUNK through the model, argmax per tile, and stitch int32 class
    # maps per image (aligned tiles agree in overlaps — the r5 pooling-phase
    # fix — so argmax-then-stitch is exact).
    _FLAT_CHUNK = 16          # the measured MXU-feeding batch at tile shapes

    def _flat_tiles(self, images: jax.Array) -> jax.Array:
        """[N, H, W] f32 -> [N*T, ti_h, ti_w, 1] gathered input tiles."""
        p = self.plan
        ti_h, ti_w = p.tile_in_hw

        def prep(image):
            if self.normalize:
                image = (image - jnp.min(image)) / jnp.maximum(
                    jnp.ptp(image), 1e-12)
            padded = reflect_pad(
                image,
                ((p.pad, p.pad + p.canvas_h - p.image_h),
                 (p.pad, p.pad + p.canvas_w - p.image_w)),
            )
            return jnp.stack([padded[y:y + ti_h, x:x + ti_w]
                              for (y, x) in p.origins])[..., None]

        return jax.vmap(prep)(images).reshape(-1, ti_h, ti_w, 1)

    def _forward_flat_ids(self, params, flat: jax.Array) -> jax.Array:
        """[M, ti, ti, 1] -> [M, to_h, to_w] int32 (argmax class ids)."""
        p = self.plan
        m = flat.shape[0]
        c = self._FLAT_CHUNK
        if self.mesh is not None:
            # the chunk stays a positive multiple of the mesh axis (the
            # sharding constraint needs divisibility), padded up from m if
            # the eval set is smaller than the axis
            n_dev = self.mesh.shape[self.mesh_axis]
            c = max(n_dev, min(_round_up(c, n_dev), _round_up(m, n_dev)))
        else:
            c = min(c, m)
        n_chunks = -(-m // c)
        pad_m = n_chunks * c - m
        if pad_m:
            # pad_m can exceed m (eval set smaller than a mesh-axis chunk):
            # cycle the real tiles as filler
            reps = -(-pad_m // m)
            filler = jnp.concatenate([flat] * reps, axis=0)[:pad_m]
            flat = jnp.concatenate([flat, filler], axis=0)
        chunks = flat.reshape(n_chunks, c, *flat.shape[1:])

        def fwd(tile_batch):
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                tile_batch = jax.lax.with_sharding_constraint(
                    tile_batch,
                    NamedSharding(self.mesh, P(self.mesh_axis)))
            if self.apply_fn is not None:
                logits = self.apply_fn(params, tile_batch)
            else:
                logits = self.model.apply(params, tile_batch)
            logits = center_crop_or_pad(logits, p.tile_out_hw)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        if n_chunks == 1:
            out = fwd(chunks[0])[None]
        else:
            out = jax.lax.map(fwd, chunks)
        to_h, to_w = p.tile_out_hw
        return out.reshape(n_chunks * c, to_h, to_w)[:m]

    def _stitch_ids(self, tile_ids: jax.Array) -> jax.Array:
        """[T, to_h, to_w] int32 -> [H, W] int32 stitched class map."""
        p = self.plan
        canvas = jnp.zeros((p.canvas_h, p.canvas_w), jnp.int32)
        for i, (y, x) in enumerate(p.out_origins):
            canvas = jax.lax.dynamic_update_slice(canvas, tile_ids[i], (y, x))
        return canvas[:p.image_h, :p.image_w]

    def _predict_ids(self, params, images: jax.Array) -> jax.Array:
        """[N, H, W] -> [N, H, W] int32 via the flat-batch path."""
        p = self.plan
        flat = self._flat_tiles(images)
        ids = self._forward_flat_ids(params, flat)
        per = ids.reshape(images.shape[0], p.num_tiles, *p.tile_out_hw)
        return jax.vmap(self._stitch_ids)(per)

    def predict_batch(self, params, images) -> jax.Array:
        """[N, H, W] -> [N, H, W] int32 class maps — one jitted program for a
        whole same-shaped eval set (the evaluation driver batches by shape),
        flat-batched across images (see _flat_tiles)."""
        if not hasattr(self, "_predict_batch"):
            self._predict_batch = jax.jit(self._predict_ids)
        return self._predict_batch(params, jnp.asarray(images, jnp.float32))

    def evaluate_batch(self, params, images, labels
                       ) -> Tuple[jax.Array, jax.Array]:
        """[N, H, W] images + [N, H, W] {0,1} labels (any int dtype; upload
        uint8 — 4x less tunnel traffic than int32) -> ([N, 2] per-image
        (iou, pixel_error), [N, H, W] int32 preds), computed in ONE jitted
        dispatch: pad -> tile -> forward -> stitch -> argmax -> metrics.

        This is the serving engine's metrics path. The r5 e2e measurement
        (results/r5/serving_e2e.json) found a warm `evaluate()` spending
        ~98% of its wall outside the kernel: the eager (unjitted) metrics
        ops each paid a ~44 ms tunnel dispatch and the int32 label upload
        paid 4x its information content. Fusing the whole per-shape-group
        journey into one program leaves: one image upload, one label
        upload, one dispatch, one 2N-float readback — preds stay on device
        unless the caller exports them."""
        if not hasattr(self, "_evaluate_batch"):
            from tpu_unet.losses.metrics import batch_evaluation_metrics

            def run(params, images, labels):
                preds = self._predict_ids(params, images)
                return batch_evaluation_metrics(preds, labels), preds

            self._evaluate_batch = jax.jit(run)
        return self._evaluate_batch(params,
                                    jnp.asarray(images, jnp.float32),
                                    jnp.asarray(labels))


def make_tile_batch_forward(model, tile_in: int, batch: int):
    """The raw throughput kernel: jitted batched forward over input tiles
    [B, tin, tin, 1] -> argmax [B, tout, tout]. Used by bench.py and the
    mesh-sharded inference path (parallel/)."""

    @jax.jit
    def fwd(params, tiles):
        logits = model.apply(params, tiles)
        return jnp.argmax(logits, axis=-1)

    return fwd
