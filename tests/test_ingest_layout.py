"""Loader tests over synthetic on-disk CTC / ISBI layout trees
(reference data.py:23-88, 141-164 directory conventions)."""

import os

import numpy as np
import pytest
from PIL import Image

from tpu_unet.data.ingest import (
    load_ctc_test,
    load_ctc_training,
    load_isbi_training,
)
from tpu_unet.data.synthetic import synthetic_instances


def _write_tiff(path, arr):
    Image.fromarray(arr).save(path)


def _make_ctc_tree(root, n_seq=2, frames=3, gt_frames=1, h=96, w=96, seed=0):
    """CTC layout: 0i/, 0i_ST/SEG, 0i_GT/SEG with man_seg* <-> t* names."""
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    for s in range(1, n_seq + 1):
        seq = f"0{s}"
        os.makedirs(os.path.join(root, seq), exist_ok=True)
        os.makedirs(os.path.join(root, f"{seq}_ST", "SEG"), exist_ok=True)
        os.makedirs(os.path.join(root, f"{seq}_GT", "SEG"), exist_ok=True)
        for t in range(frames):
            img = (rng.rand(h, w) * 255).astype(np.uint8)
            inst = synthetic_instances(h, w, 3, rng).astype(np.uint16)
            _write_tiff(os.path.join(root, seq, f"t{t:03d}.tif"), img)
            _write_tiff(os.path.join(root, f"{seq}_ST", "SEG",
                                     f"man_seg{t:03d}.tif"), inst)
            if t < gt_frames:
                _write_tiff(os.path.join(root, f"{seq}_GT", "SEG",
                                         f"man_seg{t:03d}.tif"), inst)
    return root


def test_ctc_training_excludes_gt_frames(tmp_path):
    root = _make_ctc_tree(str(tmp_path / "DS-training"), n_seq=2, frames=3,
                          gt_frames=1)
    data = load_ctc_training(root, crop=64)
    # 2 sequences x (3 ST frames - 1 GT-reserved) = 4
    assert len(data) == 4
    assert data.images.shape == (4, 96, 96)
    assert set(np.unique(data.targets)) <= {0.0, 255.0}
    assert data.crop_log_probs.shape[0] == 4
    # No filesystem mutation (reference deletes/copies ST files).
    st = os.listdir(os.path.join(root, "01_ST", "SEG"))
    assert len(st) == 3


def test_ctc_test_loads_gold_truth_only(tmp_path):
    root = _make_ctc_tree(str(tmp_path / "DS-training"), n_seq=2, frames=3,
                          gt_frames=2)
    data = load_ctc_test(root)
    assert len(data) == 4  # 2 seq x 2 GT frames
    assert data.crop_log_probs is None


def test_isbi_layout(tmp_path):
    # ISBI2012: single sequence 01 with GT labels (data.py:37-46).
    root = str(tmp_path / "ISBI2012-training")
    rng = np.random.RandomState(1)
    os.makedirs(os.path.join(root, "01"), exist_ok=True)
    os.makedirs(os.path.join(root, "01_GT", "SEG"), exist_ok=True)
    for t in range(4):
        img = (rng.rand(128, 128) * 255).astype(np.uint8)
        inst = synthetic_instances(128, 128, 4, rng).astype(np.uint16)
        _write_tiff(os.path.join(root, "01", f"t{t:03d}.tif"), img)
        _write_tiff(os.path.join(root, "01_GT", "SEG", f"man_seg{t:03d}.tif"),
                    inst)
    data = load_isbi_training(root, crop=64)
    assert len(data) == 4
    assert data.images.shape == (4, 128, 128)


def test_many_sequences_supported(tmp_path):
    # The reference's f"0{i}" breaks at >= 10 sequences (data.py:43); ours
    # matches any numeric directory name.
    root = str(tmp_path / "DS-training")
    os.makedirs(root)
    rng = np.random.RandomState(2)
    for name in ["01", "02", "10"]:
        os.makedirs(os.path.join(root, name))
        os.makedirs(os.path.join(root, f"{name}_ST", "SEG"))
        os.makedirs(os.path.join(root, f"{name}_GT", "SEG"))
        img = (rng.rand(96, 96) * 255).astype(np.uint8)
        inst = synthetic_instances(96, 96, 2, rng).astype(np.uint16)
        _write_tiff(os.path.join(root, name, "t000.tif"), img)
        _write_tiff(os.path.join(root, f"{name}_ST", "SEG", "man_seg000.tif"),
                    inst)
    data = load_ctc_training(root, crop=64)
    assert len(data) == 3
