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
# per call — plus the image shape and tile plan. Quantized engines carry their
# params baked in, so their key includes the QuantInference identity.
_ENGINE_CACHE: Dict[tuple, TileInference] = {}
_QUANT_CACHE: Dict[tuple, object] = {}

# Eval-set pinning (the r5 e2e fix, part 2): after the device path was fused
# to one dispatch, a warm evaluate() was still ~78% host-side numpy re-prep
# (crops, stacks, label thresholding) re-done per call
# (results/r5/serving_e2e_fused.txt: evaluate_batch 0.48 s vs evaluate
# 2.16 s). The prepared host arrays AND their device-resident uploads are
# cached per dataset object — the standard eval-set-resident pattern the
# trainer already uses for its val split. Entries hold a strong reference to
# `data` (so an id() key can never alias a new object) and pin the stacks in
# HBM (~2 x dataset bytes); capped FIFO.
_DATA_CACHE: Dict[int, dict] = {}
_DATA_CACHE_CAP = 2


def _prepared_groups(data: SegmentationData) -> dict:
    """Square-crop, shape-group, stack, and device-upload an eval set once;
    cached across evaluate() calls (see _DATA_CACHE above)."""
    entry = _DATA_CACHE.get(id(data))
    if entry is not None and entry["data"] is data:
        return entry
    prepared = [square_crop(data.images[i], data.targets[i])
                for i in range(len(data))]
    groups: Dict[tuple, list] = {}
    for idx, (img, _tgt) in enumerate(prepared):
        groups.setdefault(img.shape, []).append(idx)
    packed = {}
    for shape, indices in groups.items():
        imgs = np.stack([prepared[i][0]
                         for i in indices]).astype(np.float32, copy=False)
        labels = (np.stack([prepared[i][1] for i in indices])
                  > 127).astype(np.uint8)
        packed[shape] = {
            "indices": indices,
            "imgs_dev": jnp.asarray(imgs),
            "labels_dev": jnp.asarray(labels),
            "labels": labels,             # host copy for TIFF export
        }
    entry = {"data": data, "prepared": prepared, "packed": packed}
    while len(_DATA_CACHE) >= _DATA_CACHE_CAP:
        _DATA_CACHE.pop(next(iter(_DATA_CACHE)))
    _DATA_CACHE[id(data)] = entry
    return entry


def _get_engine(model, h: int, w: int, tile_out: Optional[int],
                apply_fn=None, qkey=None) -> TileInference:
    key = (model.cfg, h, w, tile_out, qkey)
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        eng = TileInference(model, h, w, tile_out=tile_out, apply_fn=apply_fn)
        _ENGINE_CACHE[key] = eng
    return eng


_FP_REDUCE = None                     # module-level jit: traced once per
_FP_MEMO: Dict[int, tuple] = {}       # param-tree structure, not per call
_FP_MEMO_CAP = 4


def _params_fingerprint(params) -> float:
    """Cheap content fingerprint for the quant cache: one jitted reduction
    over the param tree, one scalar readback. Distinguishes retrained /
    reloaded weights. The jitted reduction lives at module scope (a fresh
    closure per call re-traced the whole tree every evaluate() — ~1 s/call
    on the remote backend, results/r5/serving_e2e_pinned.txt) and the
    result is memoized per tree identity (strong-ref keyed like
    _DATA_CACHE, FIFO cap) so a pinned eval loop pays it once."""
    import jax

    memo = _FP_MEMO.get(id(params))
    if memo is not None and memo[0] is params:
        return memo[1]

    global _FP_REDUCE
    if _FP_REDUCE is None:
        @jax.jit
        def fp(p):
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(p))

        _FP_REDUCE = fp
    val = float(_FP_REDUCE(params))
    while len(_FP_MEMO) >= _FP_MEMO_CAP:
        _FP_MEMO.pop(next(iter(_FP_MEMO)))
    _FP_MEMO[id(params)] = (params, val)
    return val


def _get_quant_inference(model, params, prepared, quant_path: Optional[str],
                         phase_level0: Optional[str] = None,
                         int4: bool = False):
    """Calibrated QuantInference, cached so repeat evaluations re-use both the
    quantized params and the jitted engines (VERDICT r2: each int8 evaluation
    used to re-run full-float calibration and re-jit per shape group).

    `quant_path`: serialized QuantParams (.npz, infer/quant.py). If the file
    exists it is served from directly (no calibration); if given but absent,
    this evaluation's calibration is saved there — prepare once, serve
    anywhere."""
    from tpu_unet.infer.quant import (
        QuantInference, build_quant_inference, calibration_batch,
        load_quant_params, prepare_quant_params, save_quant_params)

    if quant_path is not None:
        key = ("path", os.path.abspath(quant_path), phase_level0, int4)
        qi = _QUANT_CACHE.get(key)
        if qi is None:
            if os.path.exists(quant_path) or os.path.exists(quant_path + ".npz"):
                qp = load_quant_params(quant_path)
                # a serialized artifact defines its own precision; serving
                # it under the other tier would silently mislabel results
                if bool(qp.q4names) != int4:
                    have = "int4" if qp.q4names else "int8"
                    want = "int4" if int4 else "int8"
                    raise ValueError(
                        f"quant_path {quant_path!r} holds an {have}-tier "
                        f"QuantParams but quant requested the {want} tier; "
                        f"use a separate path per tier")
                qi = QuantInference(qp, phase_level0=phase_level0)
            else:
                calib = calibration_batch([p[0] for p in prepared])
                qi = build_quant_inference(model, params, calib,
                                           phase_level0=phase_level0,
                                           int4=int4)
                save_quant_params(quant_path, qi.qp)
            _QUANT_CACHE[key] = qi
        return qi, key
    key = ("params", model.cfg, _params_fingerprint(params), phase_level0,
           int4)
    qi = _QUANT_CACHE.get(key)
    if qi is None:
        calib = calibration_batch([p[0] for p in prepared])
        qi = build_quant_inference(model, params, calib,
                                   phase_level0=phase_level0, int4=int4)
        _QUANT_CACHE[key] = qi
    return qi, key


def evaluate(
    model,
    params,
    data: SegmentationData,
    output_dir: Optional[str] = None,
    tile_out: Optional[int] = None,
    verbose: bool = True,
    quant: Optional[str] = None,
    quant_path: Optional[str] = None,
) -> Dict[str, float]:
    """Evaluate on gold-truth frames; returns mean/std IoU and pixel error and
    writes ``test_iou.out`` / ``test_pe.out`` (reference ``tester.py:44-51``).

    `quant='int8'` serves through the post-training-quantized forward
    (infer/quant.py) — the measured +36% serving path; gated at < 0.5% IoU
    drop by tests/test_quant.py. `quant='int8-phase'` additionally runs
    level 0 in the phase-packed formulation (ops/phase.py), quantizing the
    packed level-0 convs too (same IoU gate, tests/test_quant.py).
    `quant='int4'` / `quant='int4-phase'` further run every cin>=128 conv
    outside level 0 w4a4 (shifted-u4 activations, ~2x the int8 MXU rate —
    infer/quant.py default_int4_names); a lower-precision tier with its own
    measured IoU gate (tests/test_quant.py).
    Calibration and engines are cached across calls; `quant_path` serves
    from (or creates) a serialized QuantParams .npz so repeat servings
    never re-calibrate.
    """
    start = time.time()
    # Group same-shaped frames so each shape runs as ONE vmapped program;
    # host prep + device upload cached per dataset (_prepared_groups).
    entry = _prepared_groups(data)
    prepared = entry["prepared"]

    apply_fn, qkey = None, None
    if quant in ("int8", "int8-phase", "int4", "int4-phase"):
        phase = "int8" if quant.endswith("-phase") else None
        qi, qkey = _get_quant_inference(model, params, prepared, quant_path,
                                        phase_level0=phase,
                                        int4=quant.startswith("int4"))
        apply_fn = lambda _p, tiles: qi.apply(tiles)
    elif quant is not None:
        raise ValueError(
            f"quant must be None, 'int8', 'int8-phase', 'int4' or "
            f"'int4-phase', got {quant!r}")

    per_image = [None] * len(data)
    for shape, group in entry["packed"].items():
        engine = _get_engine(model, shape[0], shape[1], tile_out,
                             apply_fn=apply_fn, qkey=qkey)
        indices = group["indices"]
        # ONE jitted dispatch per shape group for the whole journey
        # (pad -> tile -> forward -> stitch -> argmax -> metrics) over the
        # pinned device-resident stacks: the r5 e2e measurement found the
        # eager metrics ops paying one ~44 ms tunnel dispatch EACH, int32
        # labels paying 4x their content, and the host prep re-running
        # per call (results/r5/serving_e2e{,_fused}.txt). Predictions only
        # cross to the host when they are exported.
        ms_dev, preds_dev = engine.evaluate_batch(
            params, group["imgs_dev"], group["labels_dev"])
        ms = np.asarray(ms_dev)
        preds = np.asarray(preds_dev) if output_dir is not None else None
        for k, idx in enumerate(indices):
            per_image[idx] = ms[k]
            if output_dir is not None:
                export_predictions(output_dir, idx, prepared[idx][0],
                                   group["labels"][k] * 255, preds[k] * 255)
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
