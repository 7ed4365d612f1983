"""Valid-convolution size arithmetic and overlap-tile planning.

The U-Net (Ronneberger et al. 2015) uses unpadded 3x3 convolutions, so every
level loses 4 px and the output is smaller than the input by a fixed *context*
margin. The reference computes this with a trial loop (reference:
``functions.py:121-146``); here the arithmetic is closed-form and generalized
over network depth, and extended with the overlap-tile planner the reference
lacks (it runs whole mirrored images in one shot, ``data.py:169-191``).

For depth ``D`` (number of pooling steps, 4 in the paper) and bottleneck
resolution ``l``::

    input(l)  = 2^D * l + 4 * (2^D - 1)          # 16*l + 60  for D=4
    output(l) = 2^D * (l - 4) - 4 * (2^D - 1)    # 16*l - 124 for D=4
    context   = input - output = 12 * 2^D - 8    # 184        for D=4

Key pairs for D=4: 196->(380,196), 388->(572,388), 512->(700,516).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

DEPTH = 4
#: Total context consumed by the network: input_size - output_size.
CONTEXT = 12 * 2 ** DEPTH - 8  # = 184 for DEPTH=4


def context_for_depth(depth: int = DEPTH) -> int:
    """Input/output size difference for a U-Net with `depth` pooling steps."""
    return 12 * 2 ** depth - 8


def input_size_for_output(output_size: int, depth: int = DEPTH) -> int:
    """Network input size whose valid output is exactly `output_size`.

    `output_size` must be a multiple of 2^depth minus the decoder losses, i.e.
    output = 2^depth * (l - 4) - 4*(2^depth - 1) for integer bottleneck l.
    """
    ctx = context_for_depth(depth)
    input_size = output_size + ctx
    if output_size_for_input(input_size, depth) != output_size:
        raise ValueError(
            f"{output_size} is not a valid output size for depth {depth}: "
            f"need output ≡ {(-4 * (2**depth - 1) - 4 * 2**depth) % 2**depth} "
            f"(mod {2**depth})"
        )
    return input_size


def output_size_for_input(input_size: int, depth: int = DEPTH) -> int:
    """Valid output size for a given input size (must divide cleanly)."""
    size = input_size
    for _ in range(depth):
        size = size - 4
        if size % 2 != 0 or size <= 0:
            raise ValueError(f"{input_size} is not a valid input size for depth {depth}")
        size //= 2
    size -= 4  # bottleneck convs
    for _ in range(depth):
        size = size * 2 - 4
    if size <= 0:
        raise ValueError(f"{input_size} is too small for depth {depth}")
    return size


def valid_sizes(lowest_res: int, depth: int = DEPTH) -> Tuple[int, int]:
    """(input_size, output_size) for bottleneck resolution `lowest_res`."""
    two_d = 2 ** depth
    input_size = two_d * lowest_res + 4 * (two_d - 1)
    output_size = two_d * (lowest_res - 4) - 4 * (two_d - 1)
    return input_size, output_size


def input_size_compute(original_size: int, depth: int = DEPTH) -> Tuple[int, int, int]:
    """Smallest network input whose valid output covers `original_size`.

    Behaviour-parity with reference ``functions.py:121-146``: starts the search
    at bottleneck resolution 20 and increments by 2, returning
    (original_size, input_size, output_size). Key pairs (depth 4):
    196->(380,196), 388->(572,388), 512->(700,516), 696->(892,708).
    """
    lowest_res = 20
    input_size, output_size = valid_sizes(lowest_res, depth)
    while output_size < original_size:
        lowest_res += 2
        input_size, output_size = valid_sizes(lowest_res, depth)
    return original_size, input_size, output_size


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static plan for overlap-tile inference over one image shape.

    The image is mirror-padded once to `padded_h x padded_w`; each tile reads
    an `tile_in x tile_in` window at `origins[i]` (coordinates in the padded
    image) and contributes a `tile_out x tile_out` output window at
    `out_origins[i]` (coordinates in the original image). Later tiles in
    each row/column are edge-aligned, so stitching writes overlapping regions
    with identical values (the network is fully convolutional).
    """

    image_h: int
    image_w: int
    tile_in: "int | Tuple[int, int]"   # int (square) or (h, w) strip tiles
    tile_out: "int | Tuple[int, int]"
    pad: int                     # mirror-pad margin before each axis (= context // 2)
    canvas_h: int                # stitched-output canvas (>= image; crop to image at the end)
    canvas_w: int
    padded_h: int                # mirror-padded input: canvas + 2*pad
    padded_w: int
    origins: Tuple[Tuple[int, int], ...]      # input-window origins (padded coords)
    out_origins: Tuple[Tuple[int, int], ...]  # output-window origins (canvas coords)

    @property
    def num_tiles(self) -> int:
        return len(self.origins)

    @property
    def tile_in_hw(self) -> Tuple[int, int]:
        t = self.tile_in
        return t if isinstance(t, tuple) else (t, t)

    @property
    def tile_out_hw(self) -> Tuple[int, int]:
        t = self.tile_out
        return t if isinstance(t, tuple) else (t, t)


def _tile_starts(extent: int, tile: int, align: int = 2 ** DEPTH) -> List[int]:
    """Output-window start offsets covering [0, extent), every start a
    multiple of `align` (one pooling period, 2^depth = 16): the stride is
    `tile` rounded down to the period and the last start is rounded UP past
    ``extent - tile`` (the canvas grows past the image and is trimmed after
    stitching — `plan_tiles`). Aligned starts keep the pooling grid in
    phase across tiles, so the stitched output EQUALS the whole-image pass;
    the previous flush-to-edge clamp produced starts like 780 ≡ 12 (mod 16)
    whose tiles evaluate the network at a shifted pooling phase — each tile
    valid in isolation but disagreeing with its neighbours in the overlap
    (measured 88% argmax agreement on a misaligned plan; exact after
    alignment — tests/test_infer.py::test_tiled_matches_whole_image_any_size)."""
    if extent <= tile:
        return [0]
    stride = max(align, (tile // align) * align)
    last = -(-(extent - tile) // align) * align
    starts = list(range(0, last, stride))
    starts.append(last)
    return starts


def plan_tiles(image_h: int, image_w: int,
               tile_out: "int | Tuple[int, int]",
               depth: int = DEPTH) -> TilePlan:
    """Plan overlap-tile inference: tile the output domain by `tile_out`,
    mirror-pad by context/2 so every tile's input window exists.

    This is the true overlap-tile strategy of the paper (Fig. 2), which the
    reference approximates by one whole-image mirrored pass
    (``data.py:169-191``, see SURVEY.md §2.3). `tile_out` may be an (h, w)
    pair for rectangular STRIP tiles — a tall strip shares the halo context
    its square sub-tiles would each re-read, cutting duplicated context
    (valid convs make the strip forward exactly the union of the tile
    forwards; round-3 serving formulation)."""
    square = not isinstance(tile_out, tuple)
    to_h, to_w = (tile_out, tile_out) if square else tile_out
    ti_h = input_size_for_output(to_h, depth)
    ti_w = input_size_for_output(to_w, depth)
    tile_in = ti_h if square else (ti_h, ti_w)
    pad = (ti_h - to_h) // 2
    ys = _tile_starts(image_h, to_h)
    xs = _tile_starts(image_w, to_w)
    canvas_h = ys[-1] + to_h              # >= image_h (tile may exceed the image)
    canvas_w = xs[-1] + to_w
    out_origins = tuple((y, x) for y in ys for x in xs)
    # The image sits at [pad, pad) in the padded frame, so the input window for
    # output origin (y, x) starts at the same (y, x) in padded coordinates.
    origins = tuple((y, x) for (y, x) in out_origins)
    return TilePlan(
        image_h=image_h,
        image_w=image_w,
        tile_in=tile_in,
        tile_out=tile_out,
        pad=pad,
        canvas_h=canvas_h,
        canvas_w=canvas_w,
        padded_h=canvas_h + 2 * pad,
        padded_w=canvas_w + 2 * pad,
        origins=origins,
        out_origins=out_origins,
    )
