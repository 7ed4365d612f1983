"""Size arithmetic and overlap-tile planning (reference: functions.py:121-146)."""

import pytest

from tpu_unet.core import (
    CONTEXT,
    input_size_compute,
    input_size_for_output,
    output_size_for_input,
    plan_tiles,
    valid_sizes,
)


def test_context_constant():
    assert CONTEXT == 184


@pytest.mark.parametrize(
    "original,input_size,output_size",
    [(196, 380, 196), (388, 572, 388), (512, 700, 516), (696, 892, 708)],
)
def test_input_size_compute_key_pairs(original, input_size, output_size):
    # Golden pairs from SURVEY.md §2.6 (reference trial-loop results).
    assert input_size_compute(original) == (original, input_size, output_size)


def test_input_size_compute_matches_reference_loop():
    # Re-derive the reference's trial loop independently and compare.
    def reference_loop(original_size):
        lowest_res = 20
        inp = (((lowest_res * 2 + 4) * 2 + 4) * 2 + 4) * 2 + 4
        out = ((((lowest_res - 4) * 2 - 4) * 2 - 4) * 2 - 4) * 2 - 4
        while out < original_size:
            lowest_res += 2
            inp = (((lowest_res * 2 + 4) * 2 + 4) * 2 + 4) * 2 + 4
            out = ((((lowest_res - 4) * 2 - 4) * 2 - 4) * 2 - 4) * 2 - 4
        return original_size, inp, out

    for size in range(1, 1200, 37):
        assert input_size_compute(size) == reference_loop(size)


def test_inverse_size_maps():
    for l in range(8, 64, 2):
        inp, out = valid_sizes(l)
        assert inp - out == CONTEXT
        assert output_size_for_input(inp) == out
        assert input_size_for_output(out) == inp


def test_invalid_sizes_raise():
    with pytest.raises(ValueError):
        input_size_for_output(197)  # not 16l - 124
    with pytest.raises(ValueError):
        output_size_for_input(571)  # odd after conv


def test_plan_tiles_covers_image():
    plan = plan_tiles(512, 512, 388)
    assert plan.tile_in == 572
    assert plan.pad == 92
    # Origins are pooling-period-aligned (r5: misaligned origins evaluate
    # the net at a shifted pooling phase — tiles disagree with the
    # whole-image pass); the canvas may exceed the image (trimmed after
    # stitching), so padded_h >= image + context.
    assert plan.padded_h >= 512 + 184
    assert plan.canvas_h >= 512 and plan.canvas_h - 512 < 16
    for (y, x) in plan.out_origins:
        assert y % 16 == 0 and x % 16 == 0
        assert 0 <= y and 0 <= x
        assert y + 388 <= plan.canvas_h and x + 388 <= plan.canvas_w
    # Spot-check corners are covered by some tile.
    for pt in [(0, 0), (0, 511), (511, 0), (511, 511)]:
        assert any(
            oy <= pt[0] < oy + 388 and ox <= pt[1] < ox + 388
            for (oy, ox) in plan.out_origins
        )
    # Full-row/column coverage: consecutive aligned starts never leave a gap.
    ys = sorted({y for (y, _) in plan.out_origins})
    assert ys[0] == 0 and ys[-1] + 388 >= 512
    assert all(b - a <= 388 for a, b in zip(ys, ys[1:]))


def test_plan_tiles_single_tile_when_tile_covers():
    plan = plan_tiles(388, 388, 388)
    assert plan.num_tiles == 1
    plan = plan_tiles(512, 512, 516)
    assert plan.num_tiles == 1
    assert plan.tile_in == 700
