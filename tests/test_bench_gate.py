"""The bench health gate's record-scanning logic (bench.py).

The degraded-window self-defense (CLAUDE.md: the pooled chip varies up to
25x between sessions) keys off the best healthy record on disk, both the
absolute number and — round 4 onward — the same-session int8/bf16 control
ratio (VERDICT r3 item 3: int8 windows swing +-8% independently of the
session-stable bf16 control, so a ratio gate closes the blind spot an
absolute-only gate leaves). These tests pin the scanner: what counts as a
record, which field wins, and that the hard floors hold when no records
exist.
"""

import json
import os

import bench


def _write(root, rel, rec):
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rec, f)


def test_floors_hold_with_no_records(tmp_path):
    root = str(tmp_path)
    assert bench.healthy_reference("infer", root=root) == \
        bench.HEALTHY_TILES_S_FLOOR
    assert bench.healthy_reference("train", root=root) == \
        bench.HEALTHY_STEPS_S_FLOOR
    assert bench.healthy_reference("infer", field="control_ratio",
                                   root=root) == bench.HEALTHY_RATIO_FLOOR


def test_healthy_records_raise_the_reference(tmp_path):
    root = str(tmp_path)
    _write(root, "results/r9/a.json",
           {"unit": "tiles/sec/chip", "value": 480.0, "window": "healthy",
            "control_ratio": 1.62})
    _write(root, "BENCH_r09.json",
           {"parsed": {"unit": "tiles/sec/chip", "value": 470.0,
                       "window": "healthy", "control_ratio": 1.71}})
    assert bench.healthy_reference("infer", root=root) == 480.0
    # the ratio field is tracked independently of the absolute best
    assert bench.healthy_reference("infer", field="control_ratio",
                                   root=root) == 1.71
    # train records are keyed by unit prefix, not touched by infer ones
    assert bench.healthy_reference("train", root=root) == \
        bench.HEALTHY_STEPS_S_FLOOR


def test_non_healthy_and_malformed_records_ignored(tmp_path):
    root = str(tmp_path)
    _write(root, "results/r9/degraded.json",
           {"unit": "tiles/sec/chip", "value": 9999.0, "window": "degraded"})
    _write(root, "results/r9/nowindow.json",
           {"unit": "tiles/sec/chip", "value": 9999.0})
    _write(root, "results/r9/wrongunit.json",
           {"unit": "steps/sec/chip", "value": 9999.0, "window": "healthy"})
    with open(os.path.join(root, "BENCH_r10.json"), "w") as f:
        f.write("not json{")
    assert bench.healthy_reference("infer", root=root) == \
        bench.HEALTHY_TILES_S_FLOOR
    # "degraded (control ratio)" (the round-4 ratio-failed window) is not
    # "healthy" and must not feed the reference either
    _write(root, "results/r9/ratio_failed.json",
           {"unit": "tiles/sec/chip", "value": 9999.0,
            "window": "degraded (control ratio)"})
    assert bench.healthy_reference("infer", root=root) == \
        bench.HEALTHY_TILES_S_FLOOR


def test_ratio_floor_matches_headline_arithmetic():
    # 391.2 tiles/s gated record / 266.5 bf16 control midpoint = 1.468
    # (BASELINE.md); the floor must stay consistent with the documented
    # derivation so future edits to either are caught.
    assert abs(bench.HEALTHY_RATIO_FLOOR - 391.2 / 266.5) < 2e-3
    assert 0.9 <= bench.RATIO_FRACTION < 1.0


def test_doomed_candidate_skips_plain_int8_above_1188():
    # ADVICE r3 item 1: the fallback descent must not attempt plain-int8
    # (phase_level0=None) candidates above the documented 1188-out compile
    # ceiling; every phase variant may attempt any tile.
    assert bench.doomed_candidate(None, 1268)
    assert bench.doomed_candidate(None, 1348)
    assert not bench.doomed_candidate(None, 1188)
    assert not bench.doomed_candidate(None, 516)
    for phv in ("bf16", "int8"):
        assert not bench.doomed_candidate(phv, 1348)
