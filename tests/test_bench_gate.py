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
import types

import bench


def _args(**kw):
    """Minimal args namespace for run_sweep (no jax needed)."""
    base = dict(dtype="bfloat16", no_int8=False, skip_bf16=False,
                phase="int8", int8_impls="xla")
    base.update(kw)
    return types.SimpleNamespace(**base)


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


def test_train_reference_is_batch_keyed(tmp_path):
    # VERDICT r4 item 5: batch 2 and batch 8 each gate against their OWN
    # healthy record; the unit string carries the batch, so records never mix.
    root = str(tmp_path)
    _write(root, "results/r9/t2.json",
           {"unit": "steps/sec/chip (batch 2, 572-in)", "value": 21.4,
            "window": "healthy"})
    _write(root, "results/r9/t8.json",
           {"unit": "steps/sec/chip (batch 8, 572-in)", "value": 9.1,
            "window": "healthy"})
    assert bench.healthy_reference("train", root=root) == 21.4
    assert bench.healthy_reference("train", root=root, train_batch=8) == 9.1
    # per-batch floors hold with no records (8.475 = the 67.8 samples/s
    # batch-8 record / 8, results/r4/train_batch_sweep.txt)
    empty = str(tmp_path / "empty")
    assert bench.healthy_reference("train", root=empty, train_batch=8) == \
        bench.HEALTHY_TRAIN_FLOORS[8]
    assert bench.HEALTHY_TRAIN_FLOORS[8] == 8.475


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


# ---- un-nullable emission / ordering / deadline (VERDICT r4 item 1) --------


def test_emitter_provisional_then_final(capsys):
    em = bench.Emitter(metric="m", value=None)
    em.update(value=1.0)
    em.provisional()
    em.update(value=2.0)
    em.final()
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert recs[0] == {"metric": "m", "value": 1.0, "provisional": True}
    # the authoritative line has no provisional flag and the latest state
    assert recs[1] == {"metric": "m", "value": 2.0}


def test_deadline_ok_and_disable():
    t = [0.0]
    dl = bench.Deadline(100, start=0.0, clock=lambda: t[0])
    assert dl.ok() and dl.ok(99) and not dl.ok(101)
    t[0] = 50.0
    assert dl.ok(49) and not dl.ok(51)
    t[0] = 200.0
    assert not dl.ok()
    # seconds <= 0 disables the deadline entirely
    assert bench.Deadline(0, start=0.0, clock=lambda: t[0]).ok(1e12)


def test_phase_variants_lead_with_the_headline():
    # headline-first ordering (item 1b): in A/B modes phase-int8 must be the
    # arm standing if a deadline prunes the comparison arm
    assert bench.phase_variant_list("ab")[0] == ("int8", False)
    assert bench.phase_variant_list("ab4")[0] == ("int8", False)
    assert bench.phase_variant_list("int8") == [("int8", False)]


def test_run_sweep_headline_arm_before_control(capsys):
    calls = []

    def bench_fn(b, tout, apply_fn=None, label=""):
        calls.append("quant" if apply_fn is not None else "bf16")
        return (400.0, 0.03) if apply_fn is not None else (266.0, 0.03)

    em = bench.Emitter(value=None, mode=None)
    best, mode, ctrl, qbest, rt = bench.run_sweep(
        _args(), [(16, 1028)], [(16, 1268)], bench_fn,
        lambda impl, phv, i4: "apply", em, bench.Deadline(0), fallbacks=True)
    # item 1b: the quantized headline is measured FIRST, the control second
    assert calls == ["quant", "bf16"]
    assert best == 400.0 and mode == "int8-xla+phase:int8-16x1268"
    assert ctrl == 266.0 and qbest == 400.0 and rt == 0.03
    # item 1a: one parseable provisional line per completed measurement
    recs = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 2 and all(r["provisional"] for r in recs)
    assert recs[0]["value"] == 400.0
    assert recs[0]["mode"].startswith("int8-xla+phase:int8")
    assert recs[1]["control_bf16"] == 266.0


def test_run_sweep_deadline_never_prunes_first_measurement(capsys):
    # an expired deadline must still allow ONE headline measurement
    # (something beats nothing) but skips the control arm
    calls = []

    def bench_fn(b, tout, apply_fn=None, label=""):
        calls.append("quant" if apply_fn is not None else "bf16")
        return 400.0, 0.03

    t = [1000.0]
    dl = bench.Deadline(100, start=0.0, clock=lambda: t[0])
    em = bench.Emitter(value=None, mode=None)
    best, mode, ctrl, qbest, rt = bench.run_sweep(
        _args(), [(16, 1028)], [(16, 1268)], bench_fn,
        lambda *a: "apply", em, dl, fallbacks=True)
    assert calls == ["quant"]
    assert qbest == 400.0 and ctrl == 0.0
    recs = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert recs and recs[-1]["value"] == 400.0


def test_run_sweep_deadline_prunes_comparison_arm(capsys):
    # ab mode with the budget exhausting after the first (headline)
    # measurement: the plain-int8 comparison arm and the control are skipped
    t = [0.0]
    calls = []

    def bench_fn(b, tout, apply_fn=None, label=""):
        calls.append(label.strip() or "bf16")
        t[0] = 1000.0  # this measurement spends the whole budget
        return 400.0, 0.03

    dl = bench.Deadline(100, start=0.0, clock=lambda: t[0])
    em = bench.Emitter(value=None, mode=None)
    bench.run_sweep(_args(phase="ab"), [(16, 1028)],
                    [(16, 1268), (16, 1188)], bench_fn,
                    lambda *a: "apply", em, dl, fallbacks=True)
    assert calls == ["int8-xla+phase:int8"]
    capsys.readouterr()


def test_run_sweep_ab_per_variant_fallback(capsys):
    # per-variant fallback survives the reordering: plain int8 is doomed at
    # 1268 (compile ceiling 1188) so the plain arm descends to 1188 while the
    # phase arm stops at its 1268 success; the control runs last
    calls = []

    def bench_fn(b, tout, apply_fn=None, label=""):
        calls.append((tout, label.strip() if apply_fn is not None else "bf16"))
        return 300.0, 0.03

    em = bench.Emitter(value=None, mode=None)
    bench.run_sweep(_args(phase="ab"), [(16, 1028)],
                    [(16, 1268), (16, 1188)], bench_fn,
                    lambda impl, phv, i4: "apply", em, bench.Deadline(0),
                    fallbacks=True)
    assert calls == [(1268, "int8-xla+phase:int8"), (1188, "int8-xla"),
                     (1028, "bf16")]
    capsys.readouterr()


def test_run_sweep_retries_transient_failure_once(capsys):
    # one transient compile failure must not drop the headline mode
    attempts = []

    def bench_fn(b, tout, apply_fn=None, label=""):
        attempts.append(label.strip() or "bf16")
        if len(attempts) == 1:
            raise RuntimeError("remote compile 500")
        return 400.0, 0.03

    em = bench.Emitter(value=None, mode=None)
    best, mode, ctrl, qbest, rt = bench.run_sweep(
        _args(skip_bf16=True), [], [(16, 1268)], bench_fn,
        lambda *a: "apply", em, bench.Deadline(0), fallbacks=True)
    assert len(attempts) == 2 and qbest == 400.0
    capsys.readouterr()


def test_scan_length_ladder_deterministic():
    # normal-window pings (~28-40 ms) must all land on the same rung —
    # the scan length is part of the traced graph, so session-dependent
    # lengths defeat the persistent compilation cache (the r5b 85 s
    # warm-cache recompile, results/r5/bench_default_r5b.log)
    for need in (5, 7.8, 10, 10.3, 12):
        assert bench.scan_length(need) == 12
    assert bench.scan_length(13) == 24
    assert bench.scan_length(25.5) == 48
    assert bench.scan_length(400) == 48          # top rung caps
    assert bench.scan_length(33, rungs=(32, 48, 64)) == 48
