"""Overlap-tile inference: stitched == whole-image (fully-convolutional
consistency), engine vs reference whole-image behaviour, evaluation driver."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_unet.config import ModelConfig
from tpu_unet.data import synthetic_dataset
from tpu_unet.infer import TileInference, evaluate
from tpu_unet.models import UNet


@pytest.fixture(scope="module")
def tiny_model():
    model = UNet(ModelConfig(base_width=2, skip_variant="paper"))
    x = jnp.zeros((1, 188, 188, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_single_tile_matches_whole_image_pass(tiny_model):
    # tile_out=None -> whole-image mirrored pass (reference parity mode).
    model, params = tiny_model
    img = np.random.RandomState(0).rand(40, 40).astype(np.float32)
    eng = TileInference(model, 40, 40)
    logits = eng.predict_logits(params, img)
    assert logits.shape == (40, 40, 2)
    pred = eng.predict(params, img)
    assert set(np.unique(np.asarray(pred))) <= {0, 1}


def test_stitch_matches_direct_oracle(tiny_model):
    # Validate gather/stitch mechanics: replicate the engine's steps by hand
    # (numpy pad -> per-tile model.apply -> ordered window writes) and demand
    # exact agreement.
    model, params = tiny_model
    img = np.random.RandomState(1).rand(72, 72).astype(np.float32)
    eng = TileInference(model, 72, 72, tile_out=36, batch_tiles=4)
    got = np.asarray(eng.predict_logits(params, img))

    p = eng.plan
    norm = (img - img.min()) / np.ptp(img)
    padded = np.pad(
        norm,
        ((p.pad, p.pad + p.canvas_h - 72), (p.pad, p.pad + p.canvas_w - 72)),
        mode="reflect",
    )
    canvas = np.zeros((p.canvas_h, p.canvas_w, 2), np.float32)
    for (y, x), (oy, ox) in zip(p.origins, p.out_origins):
        tile = padded[y:y + p.tile_in, x:x + p.tile_in][None, ..., None]
        out = np.asarray(model.apply(params, jnp.asarray(tile)))[0]
        canvas[oy:oy + p.tile_out, ox:ox + p.tile_out] = out
    np.testing.assert_allclose(got, canvas[:72, :72], rtol=1e-4, atol=1e-5)


def test_16_aligned_tiling_matches_single_tile(tiny_model):
    # Tile origins that differ by multiples of 16 (one pooling period) keep
    # the pooling grid aligned, so a tiled pass equals one big tile.
    model, params = tiny_model
    img = np.random.RandomState(7).rand(52, 52).astype(np.float32)
    tiled = TileInference(model, 52, 52, tile_out=36, batch_tiles=4)
    assert [o for o, _ in tiled.plan.out_origins] == [0, 0, 16, 16]
    single = TileInference(model, 52, 52, tile_out=52, batch_tiles=1)
    lt = np.asarray(tiled.predict_logits(params, img))
    ls = np.asarray(single.predict_logits(params, img))
    np.testing.assert_allclose(lt, ls, rtol=5e-3, atol=1e-4)


def test_tiled_grid_covers_and_is_deterministic(tiny_model):
    model, params = tiny_model
    img = np.random.RandomState(2).rand(60, 60).astype(np.float32)
    eng = TileInference(model, 60, 60, tile_out=36, batch_tiles=2)
    assert eng.plan.num_tiles == 4
    p1 = np.asarray(eng.predict_logits(params, img))
    p2 = np.asarray(eng.predict_logits(params, img))
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (60, 60, 2)
    assert np.isfinite(p1).all()


def test_rectangular_image(tiny_model):
    # PhC frames are 520x696; the engine tiles H and W independently.
    model, params = tiny_model
    img = np.random.RandomState(9).rand(52, 84).astype(np.float32)
    eng = TileInference(model, 52, 84, tile_out=36, batch_tiles=4)
    logits = np.asarray(eng.predict_logits(params, img))
    assert logits.shape == (52, 84, 2)
    assert np.isfinite(logits).all()
    # oracle: stitch by hand
    p = eng.plan
    norm = (img - img.min()) / np.ptp(img)
    padded = np.pad(norm, ((p.pad, p.pad + p.canvas_h - 52),
                           (p.pad, p.pad + p.canvas_w - 84)), mode="reflect")
    canvas = np.zeros((p.canvas_h, p.canvas_w, 2), np.float32)
    for (y, x), (oy, ox) in zip(p.origins, p.out_origins):
        tile = padded[y:y + p.tile_in, x:x + p.tile_in][None, ..., None]
        out = np.asarray(model.apply(params, jnp.asarray(tile)))[0]
        canvas[oy:oy + p.tile_out, ox:ox + p.tile_out] = out
    np.testing.assert_allclose(logits, canvas[:52, :84], rtol=1e-4, atol=1e-5)


def test_evaluate_driver(tiny_model, tmp_path):
    model, params = tiny_model
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20, seed=5)
    out = str(tmp_path / "eval")
    result = evaluate(model, params, data, output_dir=out, verbose=False)
    assert result["num_images"] == 2
    assert np.isfinite(result["pe_mean"])
    for sub, name in [("images", "image0.tif"), ("preds", "pred1.tif"),
                      ("labels", "label0.tif")]:
        assert os.path.exists(os.path.join(out, sub, name))
    assert os.path.exists(os.path.join(out, "test_iou.out"))
    vals = np.loadtxt(os.path.join(out, "test_iou.out"))
    assert vals.shape == (2,)


def test_evaluate_quant_int8(tiny_model, tmp_path):
    # `quant='int8'` serves through the post-training-quantized forward
    # (calibrated on the eval images) with the same artifact contract.
    model, params = tiny_model
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20,
                             seed=5)
    ref = evaluate(model, params, data, verbose=False)
    out = str(tmp_path / "eval_q")
    res = evaluate(model, params, data, output_dir=out, verbose=False,
                   quant="int8")
    assert res["num_images"] == 2
    assert os.path.exists(os.path.join(out, "test_iou.out"))
    # base_width=2 quantizes nothing at min_channels=128 except via the
    # contract that the path still runs; predictions should match closely.
    assert abs(res["pe_mean"] - ref["pe_mean"]) < 0.05


def test_evaluate_quant_int8_phase(tiny_model, tmp_path):
    # 'int8-phase' routes level 0 through the phase-packed formulation
    # (ops/phase.py) inside the same evaluate contract.
    model, params = tiny_model
    data = synthetic_dataset(n_images=2, h=64, w=64, n_cells=2, crop=20,
                             seed=5)
    ref = evaluate(model, params, data, verbose=False)
    res = evaluate(model, params, data, verbose=False, quant="int8-phase")
    assert res["num_images"] == 2
    assert abs(res["pe_mean"] - ref["pe_mean"]) < 0.05


def test_strip_tiles_match_whole_image(tiny_model):
    """Rectangular strip tiles (round-3 serving formulation): a plan whose
    tile origins are all 16-aligned (multiples of 2^depth, so every tile
    samples the same pooling grid) reproduces the whole-image pass. Image
    52x68 with (52, 36) strips puts the second strip at x=32 — aligned —
    so the stitched logits must match the single-tile plan. (Plans with
    non-16-aligned clamped tiles legitimately differ in overlap regions —
    inherent to overlap-tile, square or strip alike.)"""
    model, params = tiny_model
    img = np.random.RandomState(3).rand(52, 68).astype(np.float32)
    whole = TileInference(model, 52, 68)               # one whole-image tile
    strip = TileInference(model, 52, 68, tile_out=(52, 36))
    assert strip.plan.num_tiles == 2
    assert all(x % 16 == 0 for (_, x) in strip.plan.origins)
    a = np.asarray(whole.predict_logits(params, img))
    b = np.asarray(strip.predict_logits(params, img))
    assert a.shape == b.shape == (52, 68, 2)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_evaluate_batch_fused_matches_two_step(tiny_model):
    """The one-dispatch serving metrics path (engine forward + argmax +
    metrics fused into a single jitted program, uint8 labels — the r5 e2e
    fix, results/r5/serving_e2e.json) must be bit-identical to the
    two-step predict_batch + batch_evaluation_metrics composition."""
    from tpu_unet.losses.metrics import batch_evaluation_metrics

    model, params = tiny_model
    eng = TileInference(model, 96, 96)
    rng = np.random.RandomState(7)
    imgs = rng.rand(3, 96, 96).astype(np.float32)
    labels = (rng.rand(3, 96, 96) > 0.5).astype(np.uint8)
    preds_ref = np.asarray(eng.predict_batch(params, imgs))
    ms_ref = np.asarray(batch_evaluation_metrics(
        jnp.asarray(preds_ref), jnp.asarray(labels.astype(np.int32))))
    ms, preds = eng.evaluate_batch(params, imgs, labels)
    assert np.array_equal(preds_ref, np.asarray(preds))
    assert np.allclose(ms_ref, np.asarray(ms), equal_nan=True)


def test_evaluate_pins_eval_set_across_calls(tiny_model, monkeypatch):
    """Eval-set pinning (r5 e2e fix part 2): host prep + device upload run
    once per dataset; repeat evaluate() calls reuse the pinned entry and
    return identical metrics. The cache must key on object identity with a
    strong reference (no id-aliasing) and respect its FIFO cap."""
    from tpu_unet.data import synthetic_dataset
    from tpu_unet.infer import tester

    model, params = tiny_model
    data = synthetic_dataset(n_images=2, h=96, w=96, n_cells=3, crop=64,
                             seed=3)
    tester._DATA_CACHE.clear()
    calls = []
    real = tester.square_crop
    monkeypatch.setattr(tester, "square_crop",
                        lambda img, gt: calls.append(1) or real(img, gt))
    m1 = evaluate(model, params, data, verbose=False)
    n_prep = len(calls)
    assert n_prep == len(data)
    m2 = evaluate(model, params, data, verbose=False)
    assert len(calls) == n_prep                      # no re-prep
    for k in ("iou_mean", "pe_mean"):
        assert m1[k] == m2[k]
    # FIFO cap: a stream of fresh datasets cannot grow the cache unboundedly
    for seed in (4, 5, 6):
        d = synthetic_dataset(n_images=1, h=96, w=96, n_cells=2, crop=64,
                              seed=seed)
        evaluate(model, params, d, verbose=False)
    assert len(tester._DATA_CACHE) <= tester._DATA_CACHE_CAP


def test_params_fingerprint_memoized_per_identity(tiny_model):
    """The quant-cache fingerprint must be computed once per params tree
    (module-level jit + identity memo): a fresh jit closure per call
    re-traced the whole tree every evaluate() — ~1 s/call on the remote
    backend (results/r5/serving_e2e_pinned.txt)."""
    import jax

    from tpu_unet.infer import tester

    model, params = tiny_model
    tester._FP_MEMO.clear()
    v1 = tester._params_fingerprint(params)
    assert tester._FP_MEMO and tester._params_fingerprint(params) == v1
    # a different tree (same structure) gets its own fingerprint
    params2 = jax.tree.map(lambda a: a * 2, params)
    v2 = tester._params_fingerprint(params2)
    assert v2 != v1
    assert len(tester._FP_MEMO) <= tester._FP_MEMO_CAP


def test_tiled_matches_whole_image_any_size(tiny_model):
    """Pooling-grid alignment (r5 fix): tile origins are multiples of the
    2^depth pooling period, so the stitched tiled pass EQUALS the
    whole-image pass at every image/tile size — including sizes where the
    old flush-to-edge clamp produced misaligned origins (extent-tile not a
    multiple of 16), whose tiles evaluated the network at a shifted
    pooling phase: O(1) logit disagreement, 88% argmax agreement before
    the fix. Tolerance admits only cross-compilation float noise (~1e-6
    on the 8-device CPU backend), far below the phase-error scale."""
    model, params = tiny_model
    rng = np.random.RandomState(21)
    for h, w, tout in ((160, 160, 68), (100, 148, 36), (120, 120, 52)):
        img = rng.rand(h, w).astype(np.float32)
        tiled = TileInference(model, h, w, tile_out=tout, batch_tiles=4)
        whole = TileInference(model, h, w)
        assert all(y % 16 == 0 and x % 16 == 0
                   for (y, x) in tiled.plan.out_origins)
        lt = np.asarray(tiled.predict_logits(params, img))
        lw = np.asarray(whole.predict_logits(params, img))
        np.testing.assert_allclose(lt, lw, rtol=1e-4, atol=1e-4)
