"""CLI orchestration in-process (reference main_main.py flag semantics)."""

import json
import os

import numpy as np
import pytest

from tpu_unet.cli import build_parser, main


def test_parser_flags():
    p = build_parser()
    a = p.parse_args(["-m", "TRAINING", "-d", "ISBI2012", "-f", "3", "-s", "7",
                      "-sk", "1"])
    assert a.mode == "TRAINING" and a.folds == 3 and a.seed == 7
    assert a.skip_fold == 1


def test_folds_over_5_rejected(capsys):
    with pytest.raises(SystemExit):
        main(["-m", "TRAINING", "-d", "synthetic", "-f", "9"])


def test_testing_requires_network():
    with pytest.raises(SystemExit):
        main(["-m", "TESTING", "-d", "synthetic", "--platform", "cpu"])


def test_training_folds_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "-m", "TRAINING", "-d", "synthetic", "-f", "2", "-sk", "1",
        "--epochs", "0", "--base-width", "2", "--platform", "cpu",
        "--quiet", "--out-dir", str(tmp_path / "models"),
    ])
    assert rc == 0
    # fold 0 skipped, fold 1 trained
    assert not os.path.isdir(tmp_path / "models" / "synthetic" / "fold0")
    fold1 = tmp_path / "models" / "synthetic" / "fold1"
    assert os.path.isdir(fold1 / "models" / "latest")
    assert os.path.exists(fold1 / "progress" / "loss.out")
    metrics = [json.loads(l) for l in open(fold1 / "progress" / "metrics.jsonl")]
    assert len(metrics) == 1 and np.isfinite(metrics[0]["loss"])


def test_start_from_resumes_nonzero_epoch(tmp_path, monkeypatch, capsys):
    """-sf must continue from the checkpointed epoch, not restart at 0
    (reference -sf semantics, main_main.py:244-249 — broken as shipped
    there; exercised on hardware in results/r4/drill2)."""
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "models")
    base = ["-m", "TRAINING", "-d", "synthetic", "--base-width", "2",
            "--platform", "cpu", "--quiet", "--out-dir", out]
    assert main(base + ["--epochs", "1"]) == 0
    prog = tmp_path / "models" / "synthetic" / "all" / "progress"
    n0 = len(open(prog / "loss.out").readlines())
    assert n0 == 2  # epochs 0..1
    capsys.readouterr()
    base_loud = [a for a in base if a != "--quiet"]
    assert main(base_loud + ["--epochs", "3", "-sf"]) == 0
    assert "Resumed from epoch 1" in capsys.readouterr().out
    # curves continue across the resume: epochs 0..1 preloaded, 2..3 appended
    assert len(open(prog / "loss.out").readlines()) == 4
    metrics = [json.loads(l) for l in open(prog / "metrics.jsonl")]
    assert [m["epoch"] for m in metrics] == [0, 1, 2, 3]


def test_train_then_test_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "models")
    assert main(["-m", "TRAINING", "-d", "synthetic", "--epochs", "0",
                 "--base-width", "2", "--platform", "cpu", "--quiet",
                 "--out-dir", out]) == 0
    ckpt = os.path.join(out, "synthetic", "all", "models", "best")
    assert os.path.isdir(ckpt)
    assert main(["-m", "TESTING", "-d", "synthetic", "-n", ckpt,
                 "--platform", "cpu", "--quiet"]) == 0
    assert os.path.exists(ckpt + "_test/test_iou.out")
    assert os.path.exists(ckpt + "_test/preds/pred0.tif")
