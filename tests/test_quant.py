"""Int8 quantized inference (infer/quant.py): numerics vs the bf16 model,
Pallas-vs-XLA implementation equivalence, and the quantized-layer selection.

VERDICT r1 item 2's quality gate: prediction IoU drop vs bf16 < 0.5% on the
synthetic eval set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig, OptimConfig
from tpu_unet.data import synthetic_dataset
from tpu_unet.infer.quant import (
    QuantInference,
    build_quant_inference,
    calibrate,
    default_quant_names,
    prepare_quant_params,
    add_concat_scales,
)
from tpu_unet.losses.weights import class_balance
from tpu_unet.models import UNet
from tpu_unet.train.optimizer import make_optimizer
from tpu_unet.train.trainer import TrainState, make_train_step


def test_default_quant_names_full_width():
    cfg = ModelConfig()  # widths 64..1024
    names = default_quant_names(cfg, 128)
    assert "enc0_conv1" not in names and "enc0_conv2" not in names
    assert "enc1_conv1" not in names          # 64 -> 128
    assert "enc1_conv2" in names              # 128 -> 128
    for d in (2, 3):
        assert f"enc{d}_conv1" in names and f"enc{d}_conv2" in names
    assert {"bottleneck_conv1", "bottleneck_conv2"} <= names
    for d in (1, 2, 3):
        assert f"dec{d}_conv1" in names and f"dec{d}_conv2" in names
    assert "dec0_conv1" in names              # cin 128 (cat): int8 wins
    assert "dec0_conv2" not in names          # cin 64: bf16 wins


@pytest.fixture(scope="module")
def trained_tiny():
    """A converged width-8 model (f32 train, median logit margin ~1.5) so the
    IoU-degradation gate measures quantization, not decision-boundary noise."""
    train_model = UNet(ModelConfig(base_width=8))
    model = UNet(ModelConfig(base_width=8, compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=3, h=64, w=64, n_cells=4, crop=20, seed=4)
    tx = make_optimizer(OptimConfig(lr=2e-3, momentum=0.9))
    params = train_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    step = make_train_step(train_model, class_balance, "intended", tx)

    # whole-image training at 204-in/20-out on the image centers
    imgs = data.images.astype(np.float32)
    imgs = (imgs - imgs.min()) / np.ptp(imgs)
    inp = jnp.asarray(np.pad(imgs, ((0, 0), (70, 70), (70, 70)),
                             mode="reflect"))[..., None]
    gt = jnp.asarray((data.targets[:, 22:42, 22:42] > 0).astype(np.int32))
    for _ in range(250):
        state, loss, _ = step(state, inp, gt)
    return model, state.params, imgs, data


def _predict64(apply_fn, imgs):
    """Whole-image predict on 64x64 images via a 252-in/68-out forward."""
    x = jnp.asarray(np.pad(imgs, ((0, 0), (94, 94), (94, 94)),
                           mode="reflect"))[..., None]
    logits = apply_fn(x)
    return np.asarray(jnp.argmax(logits, axis=-1))[:, 2:66, 2:66], np.asarray(logits)


def test_quant_iou_matches_bf16(trained_tiny):
    model, params, imgs, data = trained_tiny
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pred_b, logit_b = _predict64(lambda x: model.apply(bparams, x), imgs)

    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    qi = build_quant_inference(model, params, calib, min_channels=16,
                               impl="pallas", block_rows=4, interpret=True)
    assert len(qi.qp.qconv) >= 8, sorted(qi.qp.qconv)
    pred_q, logit_q = _predict64(qi.apply, imgs)

    # the test is only meaningful if the model predicts structure
    fg = (pred_b != 0).mean()
    assert fg > 0.01, f"bf16 model predicts {fg:.3%} foreground"

    # VERDICT r1 item 2 gate: < 0.5% IoU-vs-ground-truth degradation.
    def iou(pred, ref):
        return (((pred != 0) & (ref != 0)).sum()
                / max(((pred != 0) | (ref != 0)).sum(), 1))

    gt = (data.targets > 0)
    iou_b, iou_q = iou(pred_b, gt), iou(pred_q, gt)
    assert iou_b > 0.4, f"bf16 model failed to learn (IoU {iou_b:.3f})"
    drop = (iou_b - iou_q) / iou_b
    assert drop < 0.005, (
        f"int8 IoU degradation {drop:.2%} (bf16 {iou_b:.4f}, int8 {iou_q:.4f})")
    # and the predictions themselves agree away from the decision boundary
    agree = iou(pred_q, pred_b)
    assert agree > 0.98, f"int8-vs-bf16 prediction IoU {agree:.4f}"
    # logits in the same ballpark (quantization noise bounded)
    scale = np.abs(logit_b).max()
    assert np.abs(logit_q - logit_b).max() < 0.2 * scale


def test_quant_pallas_matches_xla_impl(trained_tiny):
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16))
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                           mode="reflect"))[..., None]
    lp = QuantInference(qp, impl="pallas", block_rows=5, interpret=True).apply(x)
    lx = QuantInference(qp, impl="xla").apply(x)
    # identical integer conv math; only f32 scale/concat ops may reorder
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)


def test_pair_level0_matches_unpaired(trained_tiny):
    # Level-0 batch pairing (block-diagonal kernels over channel-concatenated
    # batch halves) is exact: same partial products plus structural zeros.
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16))
    x = jnp.asarray(np.pad(imgs[:4], ((0, 0), (70, 70), (70, 70)),
                           mode="reflect"))[..., None]
    from tpu_unet.infer.quant_research import ResearchQuantInference

    y_p = ResearchQuantInference(qp, pair_level0=True).apply(x)
    y_u = QuantInference(qp).apply(x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                               rtol=1e-4, atol=1e-4)
    # odd batch falls back to the unpaired path
    y_odd = ResearchQuantInference(qp, pair_level0=True).apply(x[:3])
    np.testing.assert_allclose(np.asarray(y_odd), np.asarray(y_u)[:3],
                               rtol=1e-4, atol=1e-4)


def test_quant_params_save_load_roundtrip(trained_tiny, tmp_path):
    # Calibrate once, serialize, serve from disk: identical logits.
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16))
    path = str(tmp_path / "qp.npz")
    from tpu_unet.infer.quant import load_quant_params, save_quant_params

    save_quant_params(path, qp)
    qp2 = load_quant_params(path)
    assert qp2.qnames == qp.qnames and qp2.cfg == qp.cfg
    # level-0 float kernels stay f32 through the round trip (the phase
    # engine quantizes them from full precision, not a bf16-rounded copy)
    for name, (k, _) in qp2.fconv.items():
        want = (jnp.float32 if name in ("enc0_conv1", "enc0_conv2",
                                        "dec0_conv1", "dec0_conv2")
                else jnp.bfloat16)
        assert k.dtype == want, (name, k.dtype)
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                           mode="reflect"))[..., None]
    a = QuantInference(qp).apply(x)
    b = QuantInference(qp2).apply(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_int8_caches_engines(trained_tiny, tmp_path, monkeypatch):
    """VERDICT r2 item 6: a second evaluate(quant='int8') on the same shapes
    must re-use the cached calibration and jitted engines — zero new
    calibrations, zero new TileInference constructions."""
    import tpu_unet.infer.quant as quant_mod
    import tpu_unet.infer.tester as tester_mod
    from tpu_unet.infer.tester import evaluate

    model, params, _, data = trained_tiny
    tester_mod._ENGINE_CACHE.clear()
    tester_mod._QUANT_CACHE.clear()

    calls = {"calibrate": 0, "engines": 0}
    real_calibrate = quant_mod.calibrate
    real_engine = tester_mod.TileInference

    def counting_calibrate(*a, **k):
        calls["calibrate"] += 1
        return real_calibrate(*a, **k)

    class CountingEngine(real_engine):
        def __init__(self, *a, **k):
            calls["engines"] += 1
            super().__init__(*a, **k)

    monkeypatch.setattr(quant_mod, "calibrate", counting_calibrate)
    monkeypatch.setattr(tester_mod, "TileInference", CountingEngine)

    r1 = evaluate(model, params, data, verbose=False, quant="int8")
    first = dict(calls)
    assert first["calibrate"] == 1 and first["engines"] >= 1
    r2 = evaluate(model, params, data, verbose=False, quant="int8")
    assert calls == first, f"second evaluation rebuilt state: {calls} vs {first}"
    assert r1["iou_mean"] == r2["iou_mean"]


def test_evaluate_int8_quant_path_serves_from_disk(trained_tiny, tmp_path,
                                                   monkeypatch):
    """quant_path: first call calibrates and writes the artifact; a fresh
    process (cleared caches) serves from the file with zero calibration."""
    import tpu_unet.infer.quant as quant_mod
    import tpu_unet.infer.tester as tester_mod
    from tpu_unet.infer.tester import evaluate

    model, params, _, data = trained_tiny
    tester_mod._ENGINE_CACHE.clear()
    tester_mod._QUANT_CACHE.clear()
    path = str(tmp_path / "serving_qp.npz")

    calls = {"calibrate": 0}
    real_calibrate = quant_mod.calibrate

    def counting_calibrate(*a, **k):
        calls["calibrate"] += 1
        return real_calibrate(*a, **k)

    monkeypatch.setattr(quant_mod, "calibrate", counting_calibrate)

    r1 = evaluate(model, params, data, verbose=False, quant="int8",
                  quant_path=path)
    assert calls["calibrate"] == 1
    import os
    assert os.path.exists(path)

    # simulate a fresh serving process
    tester_mod._ENGINE_CACHE.clear()
    tester_mod._QUANT_CACHE.clear()
    r2 = evaluate(model, params, data, verbose=False, quant="int8",
                  quant_path=path)
    assert calls["calibrate"] == 1, "serving from disk must not re-calibrate"
    assert r1["iou_mean"] == r2["iou_mean"]


def test_strip_forward_equals_tiled_oracle(trained_tiny):
    """Strip serving exactness (VERDICT r2 item 1): with paper skips, one
    int8 forward over a wide strip equals the union of independent
    overlapping square-tile forwards bit-for-bit (valid convolutions are
    translation-invariant; the strip shares the tiles' halo context)."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                               mode="reflect"))[..., None]
    from tpu_unet.infer.quant import build_quant_inference

    qi = build_quant_inference(model, params, calib, min_channels=16)
    # strip: 204x236-in -> 20x52-out; tiles: two 204x204-in -> 20x20-out
    # (the geometry is per-dimension: 204 = 16*9+60 -> 20, 236 = 16*11+60 -> 52)
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (78, 78), (94, 94)),
                           mode="reflect"))[..., None]
    assert x.shape[1:3] == (220, 252)
    x = x[:, 8:212, 8:244, :]                       # [2, 204, 236, 1]
    strip = np.asarray(qi.apply(x))                 # [2, 20, 52, 2]
    tile_a = np.asarray(qi.apply(x[:, :, :204, :]))
    tile_b = np.asarray(qi.apply(x[:, :, 32:, :]))
    np.testing.assert_array_equal(strip[:, :, :20, :], tile_a)
    np.testing.assert_array_equal(strip[:, :, 32:, :], tile_b)


def test_fused_level0_forward_matches_unfused(trained_tiny):
    """fused_enc0 + fused_concat (ops/fused_level0.py) reproduce the standard
    int8 forward: identical predictions, logits within bf16 tolerance."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                               mode="reflect"))[..., None]
    from tpu_unet.infer.quant import (QuantInference, add_concat_scales,
                                      prepare_quant_params)

    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16))
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                           mode="reflect"))[..., None]
    from tpu_unet.infer.quant_research import ResearchQuantInference

    base = QuantInference(qp).apply(x)
    fused = ResearchQuantInference(qp, fused_enc0=True,
                                   fused_concat=True).apply(x)
    assert fused.shape == base.shape
    pb = np.asarray(jnp.argmax(base, -1))
    pf = np.asarray(jnp.argmax(fused, -1))
    agree = (pb == pf).mean()
    assert agree > 0.995, f"fused predictions diverge: {agree:.4f}"
    # enc0 is quantized at min_channels=16 in this fixture? No: enc0_conv1
    # has cin=1 < 16, enc0_conv2 cin=8... check fused path actually engaged
    assert "enc0_conv1" not in qp.qnames


@pytest.fixture(scope="module")
def trained_parity_pth(tmp_path_factory):
    """VERDICT r2 item 9: a checkpoint in the REFERENCE's weight regime —
    parity init (first conv std sqrt(2), 2/sqrt(N) elsewhere,
    /root/reference/network.py:60-105) and parity skips — trained on the
    fixture task, exported to a torch ``.pth`` (convert.state_dict_from_params
    + torch.save) and reloaded through convert.load_torch_checkpoint. The
    int8 gate then runs on a weight distribution and geometry different from
    trained_tiny's."""
    import torch

    from tpu_unet.convert import load_torch_checkpoint, state_dict_from_params

    cfg = ModelConfig(base_width=8, init_scheme="parity",
                      skip_variant="parity")
    train_model = UNet(cfg)
    model = UNet(ModelConfig(base_width=8, init_scheme="parity",
                             skip_variant="parity", compute_dtype="bfloat16"))
    data = synthetic_dataset(n_images=3, h=64, w=64, n_cells=4, crop=20, seed=9)
    # the parity init (first conv std sqrt(2)) needs a hotter schedule to
    # converge on the fixture task: lr 1e-2 x 600 reaches IoU ~0.98
    tx = make_optimizer(OptimConfig(lr=1e-2, momentum=0.9))
    params = train_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 188, 188, 1)))
    state = TrainState(params, tx.init(params))
    step = make_train_step(train_model, class_balance, "intended", tx)
    imgs = data.images.astype(np.float32)
    imgs = (imgs - imgs.min()) / np.ptp(imgs)
    # parity skips need an even bottleneck resolution (odd l makes the skip
    # one pixel short of the upconv output — the reference's truncating pad
    # arithmetic, network.py:108-127, cannot join those either): 220-in
    # (l=10) -> 36-out, supervised on the image's center 36x36 window.
    inp = jnp.asarray(np.pad(imgs, ((0, 0), (78, 78), (78, 78)),
                             mode="reflect"))[..., None]
    gt = jnp.asarray((data.targets[:, 14:50, 14:50] > 0).astype(np.int32))
    for _ in range(600):
        state, loss, _ = step(state, inp, gt)

    path = str(tmp_path_factory.mktemp("pth") / "unet_parity.pth")
    torch.save({k: torch.tensor(v) for k, v in
                state_dict_from_params(jax.device_get(state.params)).items()},
               path)
    params2 = jax.tree.map(jnp.asarray, load_torch_checkpoint(path))
    return model, params2, imgs, data


def test_quant_iou_gate_on_converted_pth(trained_parity_pth):
    """The < 0.5% int8 IoU gate holds on the torch-roundtripped parity-regime
    checkpoint too — quantization robustness is not specific to one weight
    distribution (VERDICT r2 item 9)."""
    model, params, imgs, data = trained_parity_pth
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    # evaluate at the TRAINING geometry (220-in/36-out): parity skips embed
    # half-res content in a zero canvas, so the function is not consistent
    # across input sizes (the reference has the same property, SURVEY §2.1)
    x = jnp.asarray(np.pad(imgs, ((0, 0), (78, 78), (78, 78)),
                           mode="reflect"))[..., None]
    pred_b = np.asarray(jnp.argmax(model.apply(bparams, x), -1))

    qi = build_quant_inference(model, params, x, min_channels=16)
    pred_q = np.asarray(jnp.argmax(qi.apply(x), -1))

    def iou(pred, ref):
        return (((pred != 0) & (ref != 0)).sum()
                / max(((pred != 0) | (ref != 0)).sum(), 1))

    gt = (data.targets[:, 14:50, 14:50] > 0)
    fg = (pred_b != 0).mean()
    assert fg > 0.01, f"bf16 model predicts {fg:.3%} foreground"
    iou_b, iou_q = iou(pred_b, gt), iou(pred_q, gt)
    assert iou_b > 0.4, f"parity model failed to learn (IoU {iou_b:.3f})"
    drop = (iou_b - iou_q) / iou_b
    assert drop < 0.005, (
        f"int8 IoU degradation {drop:.2%} (bf16 {iou_b:.4f}, int8 {iou_q:.4f})")
    assert iou(pred_q, pred_b) > 0.98


# --- phase-packed level 0 (ops/phase.py; QuantInference(phase_level0=)) -----

def test_phase_bf16_matches_float_engine(trained_tiny):
    """With no quantized layers, the packed formulation is a pure data
    relabeling of the same bf16 arithmetic — logits must agree to bf16
    rounding noise."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales, frozenset())
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (94, 94), (94, 94)),
                           mode="reflect"))[..., None]
    ref = QuantInference(qp, interpret=True).apply(x)
    got = QuantInference(qp, interpret=True, phase_level0="bf16").apply(x)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.03 * scale, rtol=0)


def test_phase_int8_iou_gate(trained_tiny):
    """phase_level0='int8' quantizes the level-0 convs too (packed cin >=
    128 at production width); hold it to the same <0.5% IoU gate as the
    production int8 path."""
    model, params, imgs, data = trained_tiny
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pred_b, logit_b = _predict64(lambda x: model.apply(bparams, x), imgs)

    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    qi = build_quant_inference(model, params, calib, min_channels=16,
                               interpret=True, phase_level0="int8")
    pred_q, logit_q = _predict64(qi.apply, imgs)

    def iou(pred, ref):
        return (((pred != 0) & (ref != 0)).sum()
                / max(((pred != 0) | (ref != 0)).sum(), 1))

    gt = (data.targets > 0)
    iou_b, iou_q = iou(pred_b, gt), iou(pred_q, gt)
    drop = (iou_b - iou_q) / max(iou_b, 1e-9)
    assert drop < 0.005, (
        f"phase-int8 IoU degradation {drop:.2%} "
        f"(bf16 {iou_b:.4f}, phase-int8 {iou_q:.4f})")
    assert iou(pred_q, pred_b) > 0.98
    scale = np.abs(logit_b).max()
    assert np.abs(logit_q - logit_b).max() < 0.2 * scale


def test_phase_matches_production_int8_closely(trained_tiny):
    """phase_level0='bf16' on the production qname set runs the SAME layers
    in int8 (level 0 stays float) — only the dec0 concat quantization point
    differs (split per-source scales vs the shared cat scale), so the two
    engines must agree closely on logits."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16))
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (94, 94), (94, 94)),
                           mode="reflect"))[..., None]
    ref = QuantInference(qp, interpret=True).apply(x)
    got = QuantInference(qp, interpret=True, phase_level0="bf16").apply(x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 0.1 * scale


def test_phase_level0_validation():
    cfg = ModelConfig(base_width=8)
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    scales = {"input": 1.0}
    qp = prepare_quant_params(cfg, params, scales, frozenset())
    with pytest.raises(ValueError):
        QuantInference(qp, phase_level0="int4")
    from tpu_unet.infer.quant_research import ResearchQuantInference

    with pytest.raises(ValueError):
        ResearchQuantInference(qp, phase_level0="bf16", pair_level0=True)
    with pytest.raises(ValueError):
        QuantInference(qp, phase_level0="int8")   # missing calibration scales
    pcfg = ModelConfig(base_width=8, skip_variant="parity")
    pmodel = UNet(pcfg)
    pparams = pmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    pqp = prepare_quant_params(pcfg, pparams, scales, frozenset())
    with pytest.raises(ValueError):
        QuantInference(pqp, phase_level0="bf16")


def test_phase_level0_q4_level0_rejected(trained_tiny):
    """phase_level0 combined with an int4 level-0 conv is rejected with a
    descriptive ValueError — prepare strips q4names from both qnames and
    fconv, so without the guard _phase_prep would die on a bare KeyError."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales, frozenset(),
                              q4names=frozenset({"enc0_conv2"}))
    with pytest.raises(ValueError, match="int4 level-0"):
        QuantInference(qp, interpret=True, phase_level0="bf16")


def test_phase_bf16_missing_scales_friendly_error():
    """mode='bf16' with a level-0 conv in qnames still folds calibration
    scales; a hand-assembled scales dict must get the descriptive error,
    not a KeyError from fold()."""
    cfg = ModelConfig(base_width=8)
    model = UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 188, 188, 1)))
    qp = prepare_quant_params(cfg, params, {"input": 1.0},
                              qnames=frozenset({"enc0_conv2"}))
    with pytest.raises(ValueError, match="calibration scale set"):
        QuantInference(qp, interpret=True, phase_level0="bf16")


def test_phase_rectangular_input(trained_tiny):
    """Strip-shaped (rectangular) tiles ride the phase engine too: both
    dims pack independently and the level-0 crop margin (88 full-res px)
    is the same on both axes."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales, frozenset())
    x = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 110)),
                           mode="reflect"))[..., None]   # 252 x 268 input
    ref = QuantInference(qp, interpret=True).apply(x)
    got = QuantInference(qp, interpret=True, phase_level0="bf16").apply(x)
    assert got.shape == ref.shape == (1, 68, 84, 2)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.03 * scale, rtol=0)


# --- int4 (w4a4) serving tier (results/r3/int4_probe2.txt) -------------------

def test_default_int4_names_full_width():
    from tpu_unet.infer.quant import default_int4_names

    cfg = ModelConfig()  # widths 64..1024
    names = default_int4_names(cfg, 128)
    # every int8-profitable conv outside level 0
    for n in ("enc0_conv1", "enc0_conv2", "dec0_conv1", "dec0_conv2"):
        assert n not in names
    assert "enc1_conv2" in names
    for d in (2, 3):
        assert f"enc{d}_conv1" in names and f"enc{d}_conv2" in names
    assert {"bottleneck_conv1", "bottleneck_conv2"} <= names
    for d in (1, 2, 3):
        assert f"dec{d}_conv1" in names and f"dec{d}_conv2" in names
    # int4 takes precedence: prepare puts these in q4conv, not qconv
    assert names <= default_quant_names(cfg, 128)


def test_int4_iou_vs_bf16(trained_tiny):
    """The int4 tier's quality contract: a LOWER-precision tier than int8
    (16 activation levels mid-depth) with its own measured gate — the drop
    bound here documents the tier, it does not claim int8 quality."""
    model, params, imgs, data = trained_tiny
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pred_b, logit_b = _predict64(lambda x: model.apply(bparams, x), imgs)
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    qi = build_quant_inference(model, params, calib, min_channels=16,
                               int4=True)
    assert len(qi.qp.q4conv) >= 8, sorted(qi.qp.q4conv)
    assert not (qi.qp.q4names & qi.qp.qnames)
    pred_q, logit_q = _predict64(qi.apply, imgs)

    def iou(pred, ref):
        return (((pred != 0) & (ref != 0)).sum()
                / max(((pred != 0) | (ref != 0)).sum(), 1))

    gt = (data.targets > 0)
    iou_b, iou_q = iou(pred_b, gt), iou(pred_q, gt)
    assert iou_b > 0.4, f"bf16 model failed to learn (IoU {iou_b:.3f})"
    drop = (iou_b - iou_q) / iou_b
    assert drop < 0.05, (
        f"int4 IoU degradation {drop:.2%} (bf16 {iou_b:.4f}, "
        f"int4 {iou_q:.4f})")
    agree = iou(pred_q, pred_b)
    assert agree > 0.90, f"int4-vs-bf16 prediction IoU {agree:.4f}"


def test_int4_split_dec_conv_matches_integer_oracle(trained_tiny):
    """The split-kernel decoder conv (concat never materialized, per-source
    scales) equals the hand-composed integer math."""
    from tpu_unet.infer.quant import _S4, _U4, default_int4_names

    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    qi = build_quant_inference(model, params, calib, min_channels=16,
                               int4=True)
    qp = qi.qp
    d = 1
    name = f"dec{d}_conv1"
    assert name in qp.q4names
    rng = np.random.RandomState(0)
    c_skip = model.cfg.widths[d]
    # u4s-encoded skip (as the int4 encoder produces) + float up tensor
    sk = jnp.asarray(rng.randint(-8, 8, (1, 20, 20, c_skip)).astype(np.int8))
    s_sk4 = qp.scales[f"enc{d}_conv2"] * _U4
    u = jnp.asarray((rng.randn(1, 16, 16, c_skip) * 0.3).astype(np.float32))
    got, (tag, s_out4) = qi._conv_i4_split(d, u, (sk, ("u4s", s_sk4)))
    assert tag == "u4s"

    # oracle: dequantize both sources, crop, concat, run the conv in plain
    # integer math on the SAME quantized operands
    from tpu_unet.models import center_crop_or_pad
    from tpu_unet.ops.conv_tiles import quantize_activations_s4

    w_q, s_w, bias = qp.q4conv[name]
    s_up4 = qp.scales[f"up{d}"] * _S4
    u_q = quantize_activations_s4(u, s_up4)
    skc = center_crop_or_pad(sk, u.shape[1:3])
    dn = jax.lax.conv_dimension_numbers(
        (1, 16, 16, c_skip), (3, 3, c_skip, w_q.shape[-1]),
        ("NHWC", "HWIO", "NHWC"))
    acc_sk = jax.lax.conv_general_dilated(
        (skc.astype(jnp.int32) + 8), w_q[:, :, :c_skip].astype(jnp.int32),
        (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    acc_up = jax.lax.conv_general_dilated(
        u_q.astype(jnp.int32), w_q[:, :, c_skip:].astype(jnp.int32),
        (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    t = (np.asarray(acc_sk, np.float32) * s_sk4
         + np.asarray(acc_up, np.float32) * s_up4)
    y = np.maximum((t * np.asarray(s_w) + np.asarray(bias)) / s_out4, 0.0)
    exp = (np.clip(np.round(y), 0.0, 15.0) - 8.0).astype(np.int8)
    assert np.array_equal(np.asarray(got), exp)


def test_int4_quant_params_save_load_roundtrip(trained_tiny, tmp_path):
    from tpu_unet.infer.quant import (default_int4_names, load_quant_params,
                                      save_quant_params)

    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              default_quant_names(model.cfg, 16),
                              q4names=default_int4_names(model.cfg, 16))
    path = str(tmp_path / "qp4.npz")
    save_quant_params(path, qp)
    qp2 = load_quant_params(path)
    assert qp2.q4names == qp.q4names and qp2.qnames == qp.qnames
    x = jnp.asarray(np.pad(imgs[:2], ((0, 0), (70, 70), (70, 70)),
                           mode="reflect"))[..., None]
    a = QuantInference(qp).apply(x)
    b = QuantInference(qp2).apply(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_int4_phase_smoke(trained_tiny):
    """evaluate(quant='int4-phase') end-to-end: the full tier composition
    (phase-packed int8 level 0 + w4a4 mid-depth) through the public API."""
    from tpu_unet.infer.tester import evaluate

    model, params, _, data = trained_tiny
    r = evaluate(model, params, data, verbose=False, quant="int4-phase")
    assert 0.0 <= r["iou_mean"] <= 1.0
    assert r["iou_mean"] > 0.4, r


def test_int4_only_decoder_conv_with_float_skip(trained_tiny):
    """q4names containing a dec conv whose encoder counterpart stays float:
    capture_skip stores the skip u4s at the source scale and the split conv
    consumes it — logits stay close to bf16."""
    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    scales = add_concat_scales(model.cfg, calibrate(model, params, calib))
    qp = prepare_quant_params(model.cfg, params, scales,
                              qnames=frozenset(),
                              q4names=frozenset({"dec1_conv1"}))
    assert qp.q4names == {"dec1_conv1"} and not qp.qnames
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pred_b, logit_b = _predict64(lambda x: model.apply(bparams, x), imgs)
    pred_q, logit_q = _predict64(QuantInference(qp).apply, imgs)
    scale = np.abs(logit_b).max()
    assert np.abs(logit_q - logit_b).max() < 0.35 * scale
    agree = ((pred_q != 0) & (pred_b != 0)).sum() / max(
        ((pred_q != 0) | (pred_b != 0)).sum(), 1)
    assert agree > 0.9


def test_int4_split_dec_conv_pad_encodes_zero(trained_tiny):
    """The parity skip variant PADS the skip up to the upconv size, and the
    int4 split conv pads in shifted-u4 encoding, where a real zero is
    STORED as -8: a 0 fill would decode to 8*s_sk4 and the +8*sum(w) shift
    correction would inject that phantom activation across the padded
    region. Oracle: the padded region must behave as u = 0 exactly.

    (A full parity-geometry quality gate is not usable here: on the
    saturated parity-init fixture EVERY SINGLE int4 layer alone costs
    5-22% prediction agreement — per-tensor w4a4 error on that weight
    distribution, unrelated to padding — so the contract is pinned at the
    op level instead.)"""
    from tpu_unet.infer.quant import _S4, _U4
    from tpu_unet.models import center_crop_or_pad
    from tpu_unet.ops.conv_tiles import quantize_activations_s4

    model, params, imgs, _ = trained_tiny
    calib = jnp.asarray(np.pad(imgs[:1], ((0, 0), (94, 94), (94, 94)),
                               mode="reflect"))[..., None]
    qi = build_quant_inference(model, params, calib, min_channels=16,
                               int4=True)
    qp = qi.qp
    d = 1
    name = f"dec{d}_conv1"
    assert name in qp.q4names
    rng = np.random.RandomState(1)
    c_skip = model.cfg.widths[d]
    # skip SMALLER than the up tensor -> center_crop_or_pad pads it up
    sk = jnp.asarray(rng.randint(-8, 8, (1, 12, 12, c_skip)).astype(np.int8))
    s_sk4 = qp.scales[f"enc{d}_conv2"] * _U4
    u = jnp.asarray((rng.randn(1, 16, 16, c_skip) * 0.3).astype(np.float32))
    got, (tag, s_out4) = qi._conv_i4_split(d, u, (sk, ("u4s", s_sk4)))
    assert tag == "u4s"

    # oracle: unshift to u in [0, 15], zero-pad THAT (real zero), conv
    w_q, s_w, bias = qp.q4conv[name]
    s_up4 = qp.scales[f"up{d}"] * _S4
    u_q = quantize_activations_s4(u, s_up4)
    sk_u = center_crop_or_pad(sk.astype(jnp.int32) + 8, u.shape[1:3])
    dn = jax.lax.conv_dimension_numbers(
        (1, 16, 16, c_skip), (3, 3, c_skip, w_q.shape[-1]),
        ("NHWC", "HWIO", "NHWC"))
    acc_sk = jax.lax.conv_general_dilated(
        sk_u, w_q[:, :, :c_skip].astype(jnp.int32),
        (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    acc_up = jax.lax.conv_general_dilated(
        u_q.astype(jnp.int32), w_q[:, :, c_skip:].astype(jnp.int32),
        (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    t = (np.asarray(acc_sk, np.float32) * s_sk4
         + np.asarray(acc_up, np.float32) * s_up4)
    y = np.maximum((t * np.asarray(s_w) + np.asarray(bias)) / s_out4, 0.0)
    exp = (np.clip(np.round(y), 0.0, 15.0) - 8.0).astype(np.int8)
    assert np.array_equal(np.asarray(got), exp)


def test_quant_path_tier_mismatch_rejected(trained_tiny, tmp_path):
    """A serialized QuantParams artifact defines its own precision tier;
    requesting the other tier from the same path must error, not silently
    serve mislabeled results."""
    from tpu_unet.infer.tester import evaluate

    model, params, _, data = trained_tiny
    path = str(tmp_path / "qp_int8.npz")
    r = evaluate(model, params, data, verbose=False, quant="int8",
                 quant_path=path)
    assert 0.0 <= r["iou_mean"] <= 1.0
    with pytest.raises(ValueError, match="tier"):
        evaluate(model, params, data, verbose=False, quant="int4",
                 quant_path=path)
