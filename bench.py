"""Headline benchmark: overlap-tile inference throughput on one TPU chip.

Prints JSON lines on stdout; the LAST line is the result:
  {"metric": "...", "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}

Un-nullable under driver timeouts (VERDICT r4 item 1 — BENCH_r04 was
rc=124/parsed:null because one slow session claim ate the budget before the
single terminal JSON line could print):
  (a) after EVERY completed measurement a best-so-far line with the same
      schema and ``"provisional": true`` is printed, so the last stdout JSON
      line is parseable even under SIGKILL-at-timeout;
  (b) the gated HEADLINE variant (phase-packed int8) runs FIRST and the bf16
      control second — ``control_ratio`` stays null until the control lands;
  (c) ``--deadline`` (default 1440 s ≈ 80% of the driver's observed ~30 min
      budget) prunes fallbacks / retries / gate-rerun pauses once spent. It
      never prunes the first measurement of an empty sweep.

Workload (BASELINE.json config 4 / north star): 512x512 output tiles through
the full-width U-Net via the overlap-tile path — each forward consumes a
mirrored (out+184)² input tile and yields the valid output covering out²
512x512-tile units (core.geometry). Baseline target: 1000 tiles/sec/chip on
v5e (no reference counterpart exists; the reference's whole-image GPU path
publishes no throughput, SURVEY.md §6).
"""

import argparse
import json
import sys
import time

_PROC_START = time.monotonic()


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


# Floor values for the health gate when no record is found on disk; the live
# reference is the best healthy-window measurement on record
# (healthy_reference() below), so the gate tracks the serving path as it
# improves instead of going stale.
HEALTHY_TILES_S_FLOOR = 364.5     # results/r2: int8-xla 16x1188
HEALTHY_STEPS_S_FLOOR = 13.3      # batch 2: round-1 healthy train window
# Per-batch train floors: only these batches gate (batch 2 = the reference
# constant, main_main.py:136; batch 8 = the measured +57% samples/s
# recommendation, 67.8 samples/s / 8 = 8.475 steps/s,
# results/r4/train_batch_sweep.txt — VERDICT r4 item 5). Records are keyed
# per batch via the unit string, so batch-2 and batch-8 references never mix.
HEALTHY_TRAIN_FLOORS = {2: HEALTHY_STEPS_S_FLOOR, 8: 8.475}
HEALTHY_FRACTION = 0.8
# Control-normalized gate (VERDICT r3 item 3): the bf16 arm is session-stable
# (265.4-267.8 across every record — r4's apparent 296.1 outlier reconciled
# as a stale-roundtrip over-subtraction, results/r5/roundtrip_reconcile.md)
# while int8 windows swing +-8% independently, so the int8/bf16 same-session
# ratio separates "this chip window is globally degraded" (ratio normal, abs
# low -> bf16 low too) from "the int8 arm specifically drew a bad window"
# (ratio low, bf16 normal). Floor = best gated record on the current default
# workload / the bf16 range midpoint: 391.2 / 266.5 = 1.468. Future records
# carry control_ratio in their JSON and healthy_reference() tracks the max.
HEALTHY_RATIO_FLOOR = 1.468
RATIO_FRACTION = 0.92             # the documented +-8% int8-specific swing

# Plain int8 (no phase packing) cannot compile above 1372-in = 1188-out
# (results/r2/bench_tilesweep2.log): the 128-lane padding on the level-0
# activations blows the remote AOT compiler. Phase packing removes that
# padding, which is what unlocked the 1268/1348 tiles (results/r3).
PLAIN_INT8_MAX_OUT = 1188

# Wall-clock budget (VERDICT r4 item 1c). The r4 driver killed bench.py
# ~28.6 min in (BENCH_r04.json tail), so the budget is ~30 min; default
# deadline = 80% of it. Cost estimates used by the pruning checks:
DEADLINE_DEFAULT = 1440.0
MEASURE_EST_S = 120.0    # one more candidate: warm-process compile + 3 runs
GATE_RERUN_EST_S = 420.0  # 90 s pause + headline re-measure + control


class Deadline:
    """Wall-clock budget awareness. `ok(need)` answers "do `need` more
    seconds fit?"; pruning callers pass their cost estimate. seconds <= 0
    disables the deadline. The clock is injectable for tests."""

    def __init__(self, seconds, start=None, clock=time.monotonic):
        self.clock = clock
        self.start = self.clock() if start is None else start
        self.seconds = float("inf") if seconds <= 0 else float(seconds)

    def elapsed(self) -> float:
        return self.clock() - self.start

    def remaining(self) -> float:
        return self.seconds - self.elapsed()

    def ok(self, need: float = 0.0) -> bool:
        return self.remaining() > need


class Emitter:
    """Best-so-far JSON emission (VERDICT r4 item 1a). Holds one result
    record; `provisional()` prints it with ``"provisional": true`` after
    every completed measurement, `final()` prints the authoritative line.
    The r4 failure mode — dying mid-sweep holding an already-measured number
    that reached no artifact — cannot recur: every measurement is followed
    by a parseable stdout line."""

    def __init__(self, **base):
        self.state = dict(base)
        self.emitted = []                      # every printed line, for tests

    def update(self, **fields):
        self.state.update(fields)

    def _print(self, record):
        line = json.dumps(record)
        self.emitted.append(line)
        print(line, flush=True)

    def provisional(self):
        self._print({**self.state, "provisional": True})

    def final(self):
        self._print(dict(self.state))


def scan_length(need: float, rungs=(12, 24, 48)) -> int:
    """Smallest rung >= `need` (top rung if none). The scan length is part
    of the traced graph's shape; quantizing it to a ladder keeps the
    program deterministic across sessions so the persistent compilation
    cache hits — a free-running roundtrip-adaptive length re-paid an 85 s
    compile with a warm cache on disk (results/r5/bench_default_r5b.log,
    scan-12 vs run 1's scan-10). Normal-window pings land on the first
    rung; degraded tunnels climb the ladder to keep the roundtrip
    subtraction < ~3% of the timed wall."""
    for n in rungs:
        if n >= need:
            return n
    return rungs[-1]


def doomed_candidate(phase_level0, out_max: int) -> bool:
    """True when a serving candidate is known-uncompilable for the variant,
    so the fallback descent skips it instead of burning two doomed 30-60 s
    remote-compile attempts (ADVICE r3 item 1): plain int8 above
    PLAIN_INT8_MAX_OUT."""
    return phase_level0 is None and out_max > PLAIN_INT8_MAX_OUT


def healthy_reference(mode: str, field: str = "value",
                      root: str = None, train_batch: int = 2) -> float:
    """Best healthy-window bench value on record for `mode` ('infer' |
    'train'): scans BENCH_r*.json (driver records) and results/*/ *.json
    (session records) under `root` (default: next to this file). A record
    counts if its unit matches the mode and carries an explicit
    window=="healthy" (pre-round-3 records without the field are covered by
    the floor constants; provisional/pending records never carry "healthy"
    until their gate passed, so a killed run's last provisional line cannot
    inflate the reference). `field` selects the tracked number: "value"
    (absolute) or "control_ratio" (int8 / bf16 same-session control,
    round-4 records onward). Train records are keyed per batch
    (`train_batch`) via the unit string — every train record since r2 spells
    "steps/sec/chip (batch N, ...)"."""
    import glob
    import os

    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    if mode == "train":
        unit_prefix = f"steps/sec/chip (batch {train_batch},"
    else:
        unit_prefix = "tiles/sec"
    if field == "control_ratio":
        best = HEALTHY_RATIO_FLOOR
    elif mode == "train":
        best = HEALTHY_TRAIN_FLOORS.get(train_batch, 0.0)
    else:
        best = HEALTHY_TILES_S_FLOOR

    def consider(rec):
        nonlocal best
        if not isinstance(rec, dict):
            return
        if "parsed" in rec:
            rec = rec["parsed"]
        if not isinstance(rec, dict):
            return
        unit = str(rec.get("unit", ""))
        value = rec.get(field)
        window = rec.get("window")
        if (unit.startswith(unit_prefix) and isinstance(value, (int, float))
                and window == "healthy"):
            best = max(best, float(value))

    paths = (glob.glob(os.path.join(root, "BENCH_r*.json"))
             + glob.glob(os.path.join(root, "results", "*", "*.json")))
    for p in paths:
        try:
            with open(p) as f:
                consider(json.load(f))
        except (OSError, ValueError):
            continue
    return best


def unet_forward_flops(tile_in: int, width_mult: int = 1,
                       tile_in_w: int = None) -> float:
    """Analytic conv FLOPs for one forward at the given input size
    (2*k^2*Cin*Cout per output pixel; includes upconvs and the 1x1 head).
    `tile_in_w` supports rectangular (strip) tiles; defaults to square."""
    w = [64 * width_mult * 2 ** i for i in range(5)]
    flops = 0.0
    h, wd = tile_in, tile_in if tile_in_w is None else tile_in_w
    cin = 1
    for d in range(4):
        flops += 2 * 9 * cin * w[d] * (h - 1) * (wd - 1)  # approx both convs
        flops += 2 * 9 * w[d] * w[d] * (h - 3) * (wd - 3)
        h, wd = (h - 4) // 2, (wd - 4) // 2
        cin = w[d]
    flops += 2 * 9 * w[3] * w[4] * (h - 1) * (wd - 1)
    flops += 2 * 9 * w[4] * w[4] * (h - 3) * (wd - 3)
    h, wd = h - 4, wd - 4
    for d in reversed(range(4)):
        h, wd = h * 2, wd * 2
        flops += 2 * 4 * w[d + 1] * w[d] * h * wd          # upconv
        flops += 2 * 9 * 2 * w[d] * w[d] * (h - 1) * (wd - 1)  # dec conv1
        flops += 2 * 9 * w[d] * w[d] * (h - 3) * (wd - 3)
        h, wd = h - 4, wd - 4
    flops += 2 * 64 * width_mult * 2 * h * wd              # 1x1 head
    return flops


def fmt(tout):
    return f"{tout[0]}x{tout[1]}" if isinstance(tout, tuple) else str(tout)


def phase_variant_list(phase: str):
    """(phase_level0, int4) variant list per --phase mode; the int4 arms ride
    phase-int8 level 0 (the production level-0 formulation) + w4a4 mid-depth.
    In the A/B modes the headline variant (phase-int8) is listed FIRST so it
    is the arm standing if a deadline prunes the comparison arm
    (headline-first ordering, VERDICT r4 item 1b)."""
    return {"off": [(None, False)], "bf16": [("bf16", False)],
            "int8": [("int8", False)],
            "ab": [("int8", False), (None, False)],
            "int4": [("int8", True)],
            "ab4": [("int8", False), ("int8", True)],
            }[phase]


def run_sweep(args, bf16_candidates, int8_candidates, bench_fn, make_apply_fn,
              emitter, deadline, fallbacks):
    """One full sweep — HEADLINE (quantized serving) arm FIRST, bf16 control
    second (VERDICT r4 item 1b: r4's driver kill landed after the control
    leg but before the headline workload ever ran; the headline is the
    number that counts, so it is the first thing measured and the control
    only refines the gate afterwards).

    `bench_fn(b, tout, apply_fn=None, label="") -> (tiles_s, roundtrip_s)`
    is injected so tests can drive the ordering/pruning logic without jax.

    Returns (best, best_mode, bf16_ctrl, quant_best, best_rt); emits a
    provisional best-so-far line after every completed measurement."""
    best, best_mode, best_rt = 0.0, None, None
    bf16_ctrl, quant_best = 0.0, 0.0

    def took(tps, mode_tag, rt):
        nonlocal best, best_mode, best_rt
        if tps > best:
            best, best_mode, best_rt = tps, mode_tag, rt
        emitter.update(value=round(best, 2), mode=best_mode,
                       vs_baseline=round(best / 1000.0, 4),
                       roundtrip_ms=(None if best_rt is None
                                     else round(best_rt * 1e3, 1)))
        emitter.provisional()

    # --- headline arm: quantized serving variants --------------------------
    if args.dtype == "bfloat16" and not args.no_int8:
        phase_variants = phase_variant_list(args.phase)
        impls = args.int8_impls.split(",")
        # Per-VARIANT fallback: each phase arm keeps descending the candidate
        # list until it succeeds — one arm's success must not suppress the
        # other's fallback, or an 'ab' run degrades into a silent one-armed
        # comparison.
        done_variants = set()
        for b, tout in int8_candidates:
            out_max = max(tout) if isinstance(tout, tuple) else tout
            for impl in impls:
                for phv, i4 in phase_variants:
                    if fallbacks and (impl, phv, i4) in done_variants:
                        continue
                    if fallbacks and doomed_candidate(phv, out_max):
                        continue
                    bits = "int4" if i4 else "int8"
                    tag = (f"{bits}-{impl}" if phv is None
                           else f"{bits}-{impl}+phase:{phv}")
                    # same 2-attempt retry as bf16: the remote compile helper
                    # 500s intermittently, and one transient failure must not
                    # silently drop the headline mode
                    for attempt in (1, 2):
                        # the deadline never prunes the first measurement of
                        # an empty sweep — something beats nothing
                        if quant_best > 0 and not deadline.ok(MEASURE_EST_S):
                            log(f"  deadline ({deadline.remaining():.0f}s "
                                f"left): skipping {tag} {b}x{fmt(tout)}")
                            break
                        try:
                            tps, rt = bench_fn(
                                b, tout, apply_fn=make_apply_fn(impl, phv, i4),
                                label=f" {tag}")
                            quant_best = max(quant_best, tps)
                            took(tps, f"{tag}-{b}x{fmt(tout)}", rt)
                            done_variants.add((impl, phv, i4))
                            break
                        except Exception as e:
                            log(f"  {bits} {impl} {b}x{fmt(tout)} phase={phv} "
                                f"attempt {attempt} failed: "
                                f"{type(e).__name__}: {str(e)[:200]}")
            if fallbacks and len(done_variants) == (len(phase_variants)
                                                    * len(impls)):
                break
            if (fallbacks and quant_best > 0
                    and not deadline.ok(MEASURE_EST_S)):
                break

    # --- control arm: bf16 -------------------------------------------------
    for b, tout in ([] if args.skip_bf16 else bf16_candidates):
        if quant_best > 0 and not deadline.ok(MEASURE_EST_S):
            log(f"deadline ({deadline.remaining():.0f}s left): skipping the "
                "bf16 control arm (control_ratio stays null)")
            break
        got = False
        for attempt in (1, 2):
            try:
                tps, rt = bench_fn(b, tout)
                bf16_ctrl = max(bf16_ctrl, tps)
                emitter.update(control_bf16=round(bf16_ctrl, 2))
                took(tps, f"bf16-{b}x{fmt(tout)}", rt)
                got = True
                break
            except Exception as e:  # flaky remote-compile / OOM: retry
                log(f"  out={fmt(tout)} batch={b} attempt {attempt} failed: "
                    f"{type(e).__name__}: {str(e)[:200]}")
                if quant_best > 0 and not deadline.ok(MEASURE_EST_S):
                    break
        if got and fallbacks:
            break
    return best, best_mode, bf16_ctrl, quant_best, best_rt


def bench_train(args, model, cfg, deadline):
    """Fused train-step throughput: augmentation + distance weight maps +
    weighted BCE + backward + SGD, HeLa-like shapes (572-in/388-out,
    BASELINE config 3). Gated workloads: batch 2 (the reference constant,
    main_main.py:136) and batch 8 (the measured samples/s optimum, VERDICT
    r4 item 5); each gates against its own per-batch healthy record."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_unet.config import AugmentConfig, LossConfig, OptimConfig
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.data.augment import AugmentPipeline
    from tpu_unet.losses.weights import make_weight_fn
    from tpu_unet.train.optimizer import make_optimizer
    from tpu_unet.train.trainer import TrainState, make_train_step
    from tpu_unet.utils.profiling import measure_roundtrip

    log("establishing TPU session ...")
    float(jnp.zeros(()).sum())
    rt0 = measure_roundtrip()
    log(f"tunnel roundtrip {rt0*1e3:.1f} ms")
    log("building data + model ...")
    data = synthetic_dataset(n_images=4, h=512, w=512, n_cells=8, crop=388,
                             seed=0)
    aug = AugmentConfig(crop=388)
    pipe = AugmentPipeline(aug)
    weight_fn = make_weight_fn("distance", max_objects=32)
    tx = make_optimizer(OptimConfig())
    step = make_train_step(model, weight_fn, "intended", tx)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    images = jnp.asarray(data.images)
    targets = jnp.asarray(data.targets)
    lp = jnp.asarray(data.crop_log_probs)
    pairs = jnp.asarray(data.crop_pairs)

    # The measured unit is the Trainer's production epoch engine: lax.scan
    # over n fused steps inside ONE compiled graph (trainer._epoch_scan).
    # A host-side per-step loop pays 2-3 dispatch roundtrips per step on
    # the tunnel backend (measured 69-75 ms/step vs 22.7 ms device time,
    # results/r3/bench_train_r3a.log, r3c.log) and measures the transport,
    # not the chip.
    batch = args.train_batch
    indices = jnp.asarray(np.arange(batch) % data.images.shape[0], jnp.int32)
    key0 = jax.random.PRNGKey(1)
    # Scan length sized so the roundtrip subtraction stays under ~3% of the
    # timed wall even on a degraded tunnel (VERDICT r4 weak 2): assume an
    # optimistic 40 ms/step. Quantized to the ladder (scan_length) so the
    # traced graph is deterministic across sessions and the persistent
    # compilation cache hits.
    need = max(args.iters, int(np.ceil(rt0 / 0.03 / 0.040)))
    n = scan_length(need, rungs=(32, 48, 64))
    log(f"scan length {n} steps/epoch (roundtrip-fraction sizing)")

    @jax.jit
    def run_n(state, keys):
        def body(st, key):
            inp, gt = pipe._fn(images, targets, lp, pairs, indices, key)
            st, loss, metrics = step(st, inp, gt)
            return st, loss

        return jax.lax.scan(body, state, keys)

    keys = jax.vmap(lambda i: jax.random.fold_in(key0, i))(jnp.arange(n))
    log("compiling train step ...")
    t0 = time.perf_counter()
    state, losses = run_n(state, keys)
    float(losses[-1])
    log(f"compile+first epoch {time.perf_counter() - t0:.1f}s")

    def measure_once(state, rt_before):
        t0 = time.perf_counter()
        state, losses = run_n(state, keys)
        float(losses[-1])
        wall = time.perf_counter() - t0
        # min-of-before/after roundtrip: a degraded-tunnel ping estimate
        # must not over-correct the subtraction (the r4 296.1 lesson,
        # results/r5/roundtrip_reconcile.md)
        rt_after = measure_roundtrip()
        rt = min(rt_before, rt_after)
        dt = max(wall - rt, 1e-9) / n
        sps = 1.0 / dt
        log(f"train step: {dt*1e3:.1f} ms -> {sps:.2f} steps/s "
            f"({sps * batch:.2f} samples/s, batch {batch}; "
            f"roundtrip {rt*1e3:.1f} ms = {rt/wall:.1%} of wall)")
        return sps, state, rt

    # Same degraded-window self-defense as infer mode (the pooled chip varies
    # up to 25x between sessions): re-measure after a pause when below the
    # healthy fraction, report every attempt. Gate only on the default
    # step config at the two gated batches (non-default width/dtype measures
    # something else).
    gated = (args.width_mult == 1 and args.base_width == 64
             and args.dtype == "bfloat16"
             and args.phase_level0 and batch in HEALTHY_TRAIN_FLOORS)
    ref = healthy_reference("train", train_batch=batch)
    emitter = Emitter(
        metric=("fused train step (HeLa config: augment+EDT weights+bwd+SGD)"
                + ("; phase-packed level 0" if args.phase_level0 else "")),
        value=None,
        unit=f"steps/sec/chip (batch {batch}, 572-in)",
        vs_baseline=None, window="pending", samples_per_sec=None,
        attempts=[], healthy_reference=ref, roundtrip_ms=None)
    attempts, best, rt = [], 0.0, rt0
    for i in range(3):
        sps, state, rt_used = measure_once(state, rt)
        rt = rt_used
        attempts.append(sps)
        best = max(best, sps)
        healthy = best >= HEALTHY_FRACTION * ref
        emitter.update(value=round(best, 3),
                       samples_per_sec=round(best * batch, 2),
                       attempts=[round(a, 2) for a in attempts],
                       roundtrip_ms=round(rt_used * 1e3, 1),
                       window=("n/a (non-default config)" if not gated
                               else "healthy" if healthy else "degraded"))
        emitter.provisional()
        if not gated or healthy:
            break
        if not deadline.ok(GATE_RERUN_EST_S):
            log(f"deadline ({deadline.remaining():.0f}s left): skipping the "
                "gate re-run pause; reporting the degraded window")
            break
        log(f"train measurement {sps:.2f} steps/s < "
            f"{HEALTHY_FRACTION:.0%} of healthy reference {ref}; degraded "
            f"window suspected — pausing 90 s and re-running")
        time.sleep(90)
    emitter.final()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0, help="0 = autotune")
    ap.add_argument("--tile-out", type=int, default=516,
                    help="output tile size when --batch is set")
    ap.add_argument("--candidates", default="",
                    help='comma list "BxT" pairs, e.g. "8x516,16x1028"')
    ap.add_argument("--mode", default="infer", choices=["infer", "train"],
                    help="train: fused train-step throughput (HeLa-like config)")
    ap.add_argument("--train-batch", type=int, default=2,
                    help="--mode train batch size. 2 = the reference "
                         "constant (main_main.py:136); 8 = the measured "
                         "samples/s optimum (+57%%, results/r4/"
                         "train_batch_sweep.txt). Both gate against their "
                         "own per-batch healthy record; other values "
                         "measure the envelope ungated")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--width-mult", type=int, default=1)
    ap.add_argument("--base-width", type=int, default=64,
                    help="debug-only model shrink for --cpu smoke runs; any "
                         "non-64 value is a different workload (gate off)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--deadline", type=float, default=DEADLINE_DEFAULT,
                    help="wall-clock budget in seconds measured from process "
                         "start (default 1440 ≈ 80%% of the driver's ~30 min "
                         "kill budget); once spent, remaining fallbacks / "
                         "retries / control arm / gate-rerun pauses are "
                         "skipped and the best-so-far number is finalized. "
                         "<= 0 disables")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="disable the persistent compilation cache "
                         "(.jax_cache/) — used by the cache A/B probe")
    ap.add_argument("--no-int8", action="store_true",
                    help="skip the int8-quantized serving candidate")
    ap.add_argument("--skip-bf16", action="store_true",
                    help="measure only the int8 serving candidates (sweeps)")
    ap.add_argument("--int8-impls", default="xla",
                    help='comma list of quant conv impls to bench ("xla",'
                         ' "pallas")')
    ap.add_argument("--pair0", action="store_true",
                    help="enable level-0 batch pairing in the int8 path")
    ap.add_argument("--fused", action="store_true",
                    help="enable the fused level-0 Pallas kernels in the "
                         "int8 path (enc0 chain + decoder concat+quantize)")
    ap.add_argument("--phase", default="int8",
                    choices=["off", "bf16", "int8", "ab", "int4", "ab4"],
                    help="run level 0 of the int8 serving path in the "
                         "phase-packed (space-to-depth) formulation "
                         "(ops/phase.py): 2x2 convs at 4x channels, pool as "
                         "channel max, up0 as matmul, concat eliminated; "
                         "'ab' measures phase int8 AND plain int8 in ONE "
                         "session (same chip window — the only valid "
                         "formulation comparison, results/r3 lesson). "
                         "Default 'int8' since the hardware A/B: 406.7 vs "
                         "360.7 plain-int8 tiles/s same-session, +12.8%% "
                         "(results/r3/bench_phase_ab.json). 'int4' = phase "
                         "int8 level 0 + w4a4 mid-depth convs (~2x int8 MXU "
                         "rate, results/r3/int4_probe2.txt); 'ab4' measures "
                         "phase-int8 AND phase-int4 in ONE session")
    ap.add_argument("--phase-level0", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="--mode train only: run the TRAINABLE model's "
                         "level 0 phase-packed (ModelConfig.phase_level0; "
                         "forward and both gradient convs change shape). "
                         "Default ON since the hardware A/B: 21.43 vs 15.19 "
                         "steps/s same-session, +41%% "
                         "(results/r3/phase_train_ab.txt)")
    ap.add_argument("--cpu", action="store_true", help="debug on CPU")
    args = ap.parse_args()
    if args.phase_level0 and args.mode != "train":
        ap.error("--phase-level0 is the training-model flag; the serving "
                 "bench's phase formulation is --phase bf16|int8")
    if args.phase_level0 is None:
        args.phase_level0 = args.mode == "train"
    if args.phase != "off" and (args.pair0 or args.fused):
        ap.error("--phase is a level-0 formulation of its own; it cannot "
                 "combine with --pair0/--fused (ResearchQuantInference "
                 "rejects the combination)")

    deadline = Deadline(args.deadline, start=_PROC_START)

    # Boot line: a parseable pending record BEFORE the session claim. A
    # pathological claim (r4: ~22 min) followed by a driver kill would
    # otherwise leave zero JSON on stdout — the exact BENCH_r04 failure.
    # Every later provisional/final line supersedes it (drivers parse the
    # LAST line).
    if args.mode == "train":
        boot_metric = "fused train step (HeLa config: augment+EDT weights+bwd+SGD)"
        boot_unit = f"steps/sec/chip (batch {args.train_batch}, 572-in)"
    else:
        boot_metric = ("overlap-tile inference throughput (512x512 tiles, "
                       "U-Net, best of bf16 / int8-quantized serving)")
        boot_unit = "tiles/sec/chip"
    print(json.dumps({"metric": boot_metric, "value": None,
                      "unit": boot_unit, "vs_baseline": None,
                      "window": "pending", "attempts": [],
                      "provisional": True}), flush=True)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_compile_cache:
        # Persistent compilation cache (VERDICT r4 item 2): compiles are the
        # bulk of the bench's driver-budget exposure, and the cache is a
        # measured 10x cross-process win on this backend (16.3s -> 1.6s,
        # results/r5/cache_probe_run2.txt). Repo-local dir so the driver's
        # bench run inherits the warm entries from the round's sessions.
        import os as _os

        from tpu_unet.utils.cache import enable_persistent_compilation_cache

        got = enable_persistent_compilation_cache(_os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
        if got is None:
            log("compile cache unavailable; continuing with cold compiles")

    import jax.numpy as jnp
    import numpy as np

    from tpu_unet.config import ModelConfig
    from tpu_unet.models import UNet

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = ModelConfig(width_mult=args.width_mult, base_width=args.base_width,
                      compute_dtype=args.dtype,
                      phase_level0=args.phase_level0)
    model = UNet(cfg)

    if args.mode == "train":
        return bench_train(args, model, cfg, deadline)

    rng = jax.random.PRNGKey(0)
    log("establishing TPU session ...")
    import jax.numpy as _j
    float(_j.zeros(()).sum())      # absorb the ~60s relay claim up front

    log("initializing params (on small shape) ...")
    params = model.init(rng, jnp.zeros((1, 188, 188, 1), jnp.float32))
    jax.tree.map(lambda a: a.block_until_ready(), params)
    log(f"params ready (deadline: {deadline.remaining():.0f}s left)")

    # Timing note: on remote-tunnel PJRT backends `block_until_ready` can be
    # a no-op (execution is fully async until a readback). We therefore run
    # the forwards *inside one jitted scan* and force a 4-byte scalar
    # readback; tiles/sec = n_eff*batch / (wall - readback_roundtrip).
    # Pre-cast params once: flax would cast f32->bf16 inside every forward.
    if args.dtype == "bfloat16":
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def ping_roundtrip(n=5):
        @jax.jit
        def noop(x):
            return x + 1

        float(noop(jnp.int32(0)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(noop(jnp.int32(0)))
        return (time.perf_counter() - t0) / n

    def bench_batch(b, tile_out, apply_fn=None, label=""):
        # Larger output tiles amortize the 184-px receptive-field context:
        # 516-out costs (700/516)^2 = 1.84x per pixel at level 1; 1028-out
        # only 1.39x; and rectangular STRIP tiles (tile_out = (h, w)) push
        # further — a tall strip at the proven 1372-in width shares halo
        # context between what would be vertically-adjacent square tiles
        # (paper-skip valid convs make the strip forward exactly the union
        # of the tile forwards). Throughput is counted in 512x512
        # output-tile units of USEFUL (non-duplicated) output.
        h_out, w_out = (tile_out if isinstance(tile_out, tuple)
                        else (tile_out, tile_out))
        tile_in, tile_in_w = h_out + 184, w_out + 184
        tiles_per_fwd = (h_out * w_out) / 512.0 ** 2
        if apply_fn is None:
            apply_fn = lambda tiles: model.apply(params, tiles)

        # Roundtrip handling (VERDICT r4 weak 2 — the 296.1 bf16 "outlier"
        # was a 177.6 ms degraded-window ping estimate, 13.6% of wall,
        # over-correcting an in-band measurement): (1) measure BEFORE and
        # AFTER the timed runs and subtract the MIN; (2) size the scan so
        # the roundtrip stays < ~3% of wall even at the degraded estimate.
        rt_before = ping_roundtrip()

        # Cap the resident tile buffer at ~600 MB: the remote AOT compiler
        # rejects the 16x1212^2 scan at 10 iters (940 MB buffer) but accepts
        # 6 iters (564 MB). The scan LENGTH is decoupled from the buffer via
        # modular indexing (dynamic_index_in_dim), so roundtrip-fraction
        # sizing never grows the buffer.
        distinct = max(3, min(args.iters,
                              int(6e8 / (b * tile_in * tile_in_w * 4))))
        need = max(args.iters, distinct,
                   int(np.ceil(rt_before / 0.03
                               / (b * tiles_per_fwd * 0.002))))
        n_eff = scan_length(need)
        idxs = jnp.arange(n_eff, dtype=jnp.int32) % distinct

        @jax.jit
        def run(all_tiles, idxs):
            def body(carry, i):
                t = jax.lax.dynamic_index_in_dim(all_tiles, i, axis=0,
                                                 keepdims=False)
                logits = apply_fn(t)
                preds = jnp.argmax(logits, axis=-1)
                return carry + jnp.sum(preds, dtype=jnp.int32), None

            total, _ = jax.lax.scan(body, jnp.int32(0), idxs)
            return total

        name = (f"out={h_out}" if h_out == w_out else f"out={h_out}x{w_out}")
        log(f"  {name} batch={b}{label}: generating tiles "
            f"({distinct} resident, scan-{n_eff}) ...")
        tiles = jax.random.uniform(
            jax.random.PRNGKey(1), (distinct, b, tile_in, tile_in_w, 1),
            jnp.float32)
        float(jnp.sum(tiles[0, 0, 0, 0]))  # sync generation
        log(f"  {name} batch={b}{label}: compiling scan-{n_eff} ...")
        t0 = time.perf_counter()
        float(run(tiles, idxs))
        log(f"  {name} batch={b}{label}: compile+first run "
            f"{time.perf_counter() - t0:.1f}s")
        walls = []
        for _ in range(max(1, args.warmup)):
            float(run(tiles, idxs))
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tiles, idxs))
            walls.append(time.perf_counter() - t0)
        rt_after = ping_roundtrip()
        rt = min(rt_before, rt_after)
        dt = max(float(np.median(walls)) - rt, 1e-9)
        tps = n_eff * b * tiles_per_fwd / dt
        tf = (unet_forward_flops(tile_in, args.width_mult, tile_in_w)
              * n_eff * b / dt / 1e12)
        frac = rt / (dt + rt)
        log(f"  {name} batch={b}{label}: {n_eff} x {b} fwd in "
            f"{dt*1e3:.1f} ms (roundtrip {rt*1e3:.1f} ms = {frac:.1%} of "
            f"wall; before {rt_before*1e3:.1f} / after {rt_after*1e3:.1f}) "
            f"-> {tps:.1f} 512^2-tiles/s, ~{tf:.1f} TFLOP/s")
        if frac > 0.05:
            log(f"  WARNING roundtrip is {frac:.1%} of wall — measurement "
                "is tunnel-noise exposed despite min-of-before/after")
        return tps, rt

    def parse_candidate(c):
        """'BxT' (square) or 'BxHxW' (strip/rectangular output tile)."""
        parts = list(map(int, c.split("x")))
        if len(parts) == 2:
            return (parts[0], parts[1])
        if len(parts) == 3:
            return (parts[0], (parts[1], parts[2]))
        raise ValueError(f"candidate {c!r}: want BxT or BxHxW")

    if args.candidates:
        candidates = [parse_candidate(c)
                      for c in args.candidates.split(",")]  # "8x516,16x1028"
    elif args.batch:
        candidates = [(args.batch, args.tile_out)]
    else:
        # Best-first per mode, measured same-window. Plain int8 peaked at
        # 16x1188 (results/r2/bench_tilesweep2.log: 364.5 tiles/s; 1028 gives
        # 353.6, 1604 333.2, 1316+ fails remote compilation). Phase-int8 (the
        # production level-0 formulation) removes the 128-lane padding on the
        # level-0 activations, which lets 1268/1348/1508-out compile — the r3
        # sweeps put 1348 ahead of 1188 in both orders, and the r4 confirming
        # A/B put 16x1268 ahead of 16x1348 in BOTH same-session orders
        # (results/r4/tile_ab_order{A,B}.log: 397.8 vs 389.0, then reversed
        # 402.3 vs 394.1 — +2.2%; the extent-rate decay already outweighs the
        # halo saving past ~1268), so the int8 list leads 1268. bf16 cannot
        # compile 1188+ at batch 16, so its list starts at 1028 (265). Later
        # entries are compile-safe fallbacks — each mode stops at its first
        # success.
        candidates = None  # per-mode lists below

    # int8 post-training-quantized serving path (infer/quant.py): measured
    # +17.5% over bf16 e2e (results/r2/probe4.log: 314.8 vs 267.9 tiles/s at
    # 16x1212) with < 0.5% IoU degradation (tests/test_quant.py gate).
    # impl='xla' (int8 lax.conv) won every per-layer serving shape over the
    # Pallas tiles (results/r2/shootout.txt) and is the only impl benched;
    # pass --int8-impls to probe others.
    _qi_cache = {}

    def make_int8_apply(impl, phase, int4=False):
        # calibration+quantization depend only on (impl, phase, int4), not
        # the tile shape: build once (a sweep would otherwise re-calibrate
        # per candidate per retry)
        key = (impl, phase, int4)
        if key not in _qi_cache:
            from tpu_unet.infer.quant import build_quant_inference

            calib = jax.random.uniform(jax.random.PRNGKey(2),
                                       (2, 444, 444, 1), jnp.float32)
            qi = build_quant_inference(model, params, calib, impl=impl,
                                       min_channels=128, interpret=False,
                                       phase_level0=phase, int4=int4)
            if args.pair0 or args.fused:
                # the measured-negative research formulations live in their
                # quarantined subclass (quant_research.py): rebuild the
                # engine there, reusing the calibrated QuantParams
                from tpu_unet.infer.quant_research import (
                    ResearchQuantInference)

                qi = ResearchQuantInference(
                    qi.qp, impl=impl, interpret=False,
                    phase_level0=phase, pair_level0=args.pair0,
                    fused_enc0=args.fused, fused_concat=args.fused)
            _qi_cache[key] = qi
        return _qi_cache[key].apply

    # With the default lists later candidates are compile-safe FALLBACKS
    # (stop at first success); an explicit --candidates is a sweep — measure
    # them all.
    fallbacks = not args.candidates
    if candidates is None:
        bf16_candidates = [(16, 1028), (8, 516)]
        int8_candidates = [(16, 1268), (16, 1348), (16, 1188), (16, 1028),
                           (8, 516)]
    else:
        bf16_candidates = int8_candidates = candidates

    # Self-defense against degraded chip windows (the pooled chip varies up
    # to 25x between sessions, CLAUDE.md): the health gate is the WORKLOAD
    # itself — a measurement below HEALTHY_FRACTION of the best healthy
    # number on record re-runs after a pause, and every attempt is reported.
    # The record is for the DEFAULT candidate set with int8 enabled; any
    # override (custom candidates/batch/dtype/--no-int8/--pair0) measures a
    # different workload, so the gate is skipped and window reported "n/a".
    gated = (not args.candidates and not args.batch and not args.no_int8
             and not args.skip_bf16 and args.dtype == "bfloat16"
             and not args.pair0 and not args.fused and args.width_mult == 1
             and args.base_width == 64
             and args.int8_impls == "xla" and args.phase == "int8")
    healthy_ref = healthy_reference("infer")
    ratio_ref = healthy_reference("infer", field="control_ratio")
    emitter = Emitter(
        metric="overlap-tile inference throughput (512x512 tiles, U-Net, "
               "best of bf16 / int8-quantized serving)",
        value=None, unit="tiles/sec/chip", vs_baseline=None, mode=None,
        window="pending", attempts=[], healthy_reference=healthy_ref,
        control_bf16=None, control_ratio=None,
        control_ratio_reference=round(ratio_ref, 4),
        control_ratio_attempts=[], roundtrip_ms=None)
    attempts, ratios = [], []
    best, best_mode = 0.0, None
    control_ratio = control_bf16 = None
    for _ in range(3 if gated else 1):
        tps, mode, bf16_ctrl, quant_best, rt = run_sweep(
            args, bf16_candidates, int8_candidates, bench_batch,
            make_int8_apply, emitter, deadline, fallbacks)
        attempts.append(tps)
        ratio = (quant_best / bf16_ctrl
                 if bf16_ctrl > 0 and quant_best > 0 else None)
        ratios.append(ratio)
        if tps > best:
            best, best_mode = tps, mode
            control_ratio, control_bf16 = ratio, bf16_ctrl or None
        emitter.update(
            attempts=[round(a, 1) for a in attempts],
            control_ratio=(round(control_ratio, 4) if control_ratio
                           else None),
            control_bf16=(round(control_bf16, 2) if control_bf16 else None),
            control_ratio_attempts=[None if r is None else round(r, 3)
                                    for r in ratios])
        emitter.provisional()
        if not gated:
            break
        # Two-signal gate (VERDICT r3 item 3): the absolute number catches
        # globally degraded windows; the int8 / same-session-bf16 ratio
        # catches an int8-specific bad draw that the stable bf16 control
        # would otherwise mask (the +-8% blind spot).
        abs_ok = tps >= HEALTHY_FRACTION * healthy_ref
        ratio_ok = ratio is None or ratio >= RATIO_FRACTION * ratio_ref
        if abs_ok and ratio_ok:
            break
        if not deadline.ok(GATE_RERUN_EST_S):
            log(f"deadline ({deadline.remaining():.0f}s left): skipping the "
                "gate re-run pause; reporting the degraded window")
            break
        log(f"measurement {tps:.1f} tiles/s (control ratio "
            f"{'n/a' if ratio is None else f'{ratio:.3f}'}) below gate "
            f"(abs >= {HEALTHY_FRACTION:.0%} of {healthy_ref}; ratio >= "
            f"{RATIO_FRACTION:.0%} of {ratio_ref:.3f}); degraded window "
            f"suspected — pausing 90 s and re-running")
        time.sleep(90)
    if not gated:
        window = "n/a (non-default config)"
    else:
        abs_ok = best >= HEALTHY_FRACTION * healthy_ref
        ratio_ok = (control_ratio is None
                    or control_ratio >= RATIO_FRACTION * ratio_ref)
        window = ("healthy" if abs_ok and ratio_ok
                  else "degraded (control ratio)" if abs_ok
                  else "degraded")

    if best <= 0.0:
        log("every candidate failed to produce a measurement")
        print(json.dumps({
            "metric": "overlap-tile inference throughput (512x512 tiles, "
                      "U-Net)",
            "value": None,
            "unit": "tiles/sec/chip",
            "vs_baseline": None,
            "error": "all candidates failed (compilation or runtime)",
            "attempts": [round(a, 1) for a in attempts],
        }))
        sys.exit(1)

    emitter.update(value=round(best, 2),
                   vs_baseline=round(best / 1000.0, 4),
                   mode=best_mode, window=window)
    emitter.final()


if __name__ == "__main__":
    main()
