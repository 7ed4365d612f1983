"""Round-3 TPU probe: int4 on the v5e MXU — the one quantization depth the
serving work never measured.

Motivation: the production serving path (int8 XLA convs, 365.6 tiles/s) is
emitter-bound at 245-294 T/s on the mid-depth layers vs the 394 TOPS int8
peak (results/r2/shootout.txt). v5e documents a 2x int4 MXU rate; if XLA
lowers int4 x int4 -> int32 convs at anything like that rate, the cin >= 128
layers (which carry most of the model's FLOPs at serving shapes) have
headroom the int8 path cannot reach. Quality is a separate question (4-bit
symmetric weights are lossy); this probe measures ONLY whether the compute
rate exists — no rate, no reason to build the quality machinery.

Variants per cin>=128 layer at the production serving geometry
(tile_in=1372, batch 8 — results/r2/stage_profile.txt geometry):
  int8 x int8 -> int32   control (the production conv)
  int4 x int4 -> int32   full int4 (2x-rate candidate)
  int8 x int4 -> int32   W4A8 (weight-only 4-bit)

Timing: the dependency-chained in-jit harness from tpu_quant_probe
(adaptive to the ~30 ms tunnel roundtrip).

Environment lesson (first run, results/r3/int4_probe.txt): int4 arrays
cannot cross the host<->device argument boundary on the axon backend —
`device_put` of an S4 array recurses in `_array_shard_arg` — and
`lax.conv_general_dilated` rejects mixed i8 x i4 operands. So every int4
value here is born INSIDE the jitted graph (int8 at the boundary, cast
in-jit); the cast cost is measured separately and reported for
subtraction, and W4A8 is measured as it would really execute: weights
stored int4, upcast to int8 in-graph, int8 conv. Usage:
  python scripts/tpu_int4_probe.py [--batch 8] [--tile 1372]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import tpu_quant_probe as qp
from tpu_quant_probe import gflops, log


def level_shapes_for_tile(tile):
    return [ls for ls in qp.level_shapes(tile) if ls[2] >= 128]


def make_conv(preferred=jnp.int32):
    def conv(x, w):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        preferred_element_type=preferred)
    return conv


def rand_i8(key, shape, lim):
    # int8 at the host<->device boundary; int4 values are born in-jit.
    v = jax.random.randint(key, shape, -lim, lim + 1, jnp.int32)
    return v.astype(jnp.int8)


def main():
    batch = 8
    tile = 1372
    args = sys.argv[1:]
    if "--batch" in args:
        batch = int(args[args.index("--batch") + 1])
    if "--tile" in args:
        tile = int(args[args.index("--tile") + 1])

    log(f"device: {jax.devices()[0]}")
    qp.measure_roundtrip()

    conv = make_conv()
    # Every variant takes int8 (x, w) at the jit boundary; int4 is in-graph.
    variants = [
        ("i8xi8", lambda x, w: conv(x, w)),
        ("i4xi4", lambda x, w: conv(x.astype(jnp.int4), w.astype(jnp.int4))),
        # W4A8 as it would really execute: weights STORED int4, upcast to
        # int8 in-graph (the conv itself is the int8 conv — the variant
        # exists to show the upcast is ~free, i.e. W4A8 saves weight HBM
        # only, it cannot beat i8xi8 on compute).
        ("w4a8", lambda x, w: conv(x, w.astype(jnp.int4).astype(jnp.int8))),
        # cast-only: the per-rep x-upcast bias riding in the i4xi4 number.
        ("cast", lambda x, w: x.astype(jnp.int4).astype(jnp.int8)),
    ]

    log(f"== int4 probe, batch={batch}, tile_in={tile} ==")
    key = jax.random.PRNGKey(0)
    for name, s, cin, cout in level_shapes_for_tile(tile):
        gf = gflops(batch, s, cin, cout)
        line = f"  {name:12s} {s:5d}^2 {cin:4d}->{cout:4d} {gf:9.1f} GF"
        x = rand_i8(key, (batch, s, s, cin), 127)
        w = rand_i8(key, (3, 3, cin, cout), 7)
        for vname, f in variants:
            try:
                dt = qp.timeit(f, x, w)
                line += f" | {vname} {dt*1e3:7.2f} ms {gf/dt/1e3:6.1f} T/s"
            except Exception as e:
                line += f" | {vname} FAIL {type(e).__name__}: {str(e)[:60]}"
        del x, w
        log(line)

    # Exactness spot check, fully in-jit (int4 never crosses the boundary):
    # the int4 conv must equal the int32 reference on a small shape (guards
    # against silent wraparound/packing bugs).
    @jax.jit
    def exactness(x8, w8):
        got = conv(x8.astype(jnp.int4), w8.astype(jnp.int4))
        ref = conv(x8.astype(jnp.int32), w8.astype(jnp.int32))
        return jnp.all(got == ref)

    x = rand_i8(key, (2, 36, 36, 128), 7)
    w = rand_i8(key, (3, 3, 128, 128), 7)
    ok = bool(exactness(x, w))
    log(f"int4 conv exactness vs int32 reference: {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
