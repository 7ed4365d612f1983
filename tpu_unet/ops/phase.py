"""Phase packing (space-to-depth) for the level-0 serving neighborhood.

The level-0 layers carry 55% of the serving forward
(results/r2/stage_profile.txt) and run far off the MXU's int8 rate because
their 64 channels occupy half of the 128-lane registers — XLA's emitters pad
them (64-ch convs measured at 68-94 T/s vs 245-294 at cin>=128). Round 2's
batch-pairing attack (fold two images into channels) died on the pair/unpair
data movement (4-10x off HBM bandwidth); round 3's Pallas chain fusion died
on Mosaic codegen. This module tries the third formulation: rewrite the
stride-1 3x3 valid convs over the 2x2 *phase decomposition* of the image —
the TPU space-to-depth trick, but applied so that every pack/unpack is
either trivial or absorbed by a neighboring op:

* the pack happens ONCE, on the raw 1-channel input tile (s2d of int8/bf16
  [B,H,W,1] — megabytes, not gigabytes);
* ``x2[2i+p, 2j+q, c] -> X[i, j, (p*2+q)*C + c]`` turns each 3x3 valid conv
  into a 2x2 valid conv with 4x the channels (256 in/out at level 0 — full
  lanes on both sides). The packed kernel has a fixed 9/16 nonzero
  structure, so the phase form spends 16/9 = 1.78x the FLOPs; it wins
  whenever the deep-channel rate exceeds 1.78x the 64-channel rate;
* max-pool 2x2/stride-2 consumes exactly one phase block: in the packed
  domain pool0 is an elementwise max over the four phase groups — the
  [B,H,W,4,C] reshape-max — and its output is ALREADY the unpacked
  level-1 tensor (no depth-to-space anywhere in the encoder);
* the 2x2/stride-2 transpose conv scatters disjoint 2x2 blocks: packed, it
  is ONE matmul ``[.., Cin] @ [Cin, 4*Cout]`` whose output is already
  phase-packed for the decoder convs (no depth-to-space on the way up);
* skip cropping is a spatial crop in the packed domain (margins at level 0
  are even — asserted);
* the 1x1 head is a block-diagonal 1x1 conv in the packed domain; the only
  depth-to-space in the whole network runs on the 2-channel logits.

The decoder concat is eliminated rather than packed:
``conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])``,
which in int8 also lets each source keep its own activation scale (the
scale rides the per-channel alpha into the epilogue) instead of sharing the
concat scale.

Reference workload: /root/reference/network.py:129-141 (level-0 convs and
pool), :38-58 (upconvs); the reference runs these eager on cuDNN and has no
counterpart to the packing.

Packing convention everywhere: phase-major, channel = (p*2+q)*C + c, with
(p, q) = (row, col) offsets in the 2x2 block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] (phase-major), H and W even."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even H, W; got {h}x{w}")
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """[B, h, w, 4C] -> [B, 2h, 2w, C]; inverse of :func:`space_to_depth`."""
    b, h, w, c4 = x.shape
    if c4 % 4:
        raise ValueError(f"depth_to_space needs 4|C; got {c4}")
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


# The 9/16 tap-placement structure shared by the numpy and jnp packers:
# (packed window pos aa/bb, input-phase index p*2+q, output-phase index
# r*2+s) -> source tap (a, b) of the 3x3 kernel. 36 placements.
_PACK_PLACEMENTS: Tuple[Tuple[int, int, int, int, int, int], ...] = tuple(
    (aa, bb, p * 2 + q, r * 2 + s, 2 * aa + p - r, 2 * bb + q - s)
    for aa in range(2) for bb in range(2)
    for p in range(2) for q in range(2)
    for r in range(2) for s in range(2)
    if 0 <= 2 * aa + p - r <= 2 and 0 <= 2 * bb + q - s <= 2)


def phase_pack_kernel(w) -> np.ndarray:
    """[3, 3, Ci, Co] conv kernel -> its [2, 2, 4Ci, 4Co] phase-domain form.

    ``conv2x2(s2d(x), phase_pack_kernel(w)) == s2d(conv3x3(x, w))`` for even
    input sizes. Derivation: output pixel (2i+r, 2j+s) reads input pixel
    (2i+r+a, 2j+s+b); writing r+a = 2A+p maps tap a to packed-window
    position A and input phase p, so
    ``W2[A, B, (p,q,c), (r,s,o)] = w[2A+p-r, 2B+q-s, c, o]`` where the tap
    indices land in [0, 2] and zero elsewhere (9/16 density,
    ``_PACK_PLACEMENTS``). Host-side (numpy): runs once per checkpoint load.
    """
    w = np.asarray(w)
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"phase_pack_kernel expects 3x3, got {kh}x{kw}")
    out = np.zeros((2, 2, 4, ci, 4, co), w.dtype)
    for aa, bb, pq, rs, a, b in _PACK_PLACEMENTS:
        out[aa, bb, pq, :, rs, :] = w[a, b]
    return out.reshape(2, 2, 4 * ci, 4 * co)


def phase_pack_kernel_jnp(w: jax.Array) -> jax.Array:
    """Differentiable :func:`phase_pack_kernel`: [3, 3, Ci, Co] -> packed
    [2, 2, 4Ci, 4Co] as a traced jnp computation, so a *training* forward can
    keep the canonical 3x3 parameter tree (checkpoint interop) and pack per
    step — the packing is 36 static slice writes on a kernel-sized tensor
    (negligible next to the convs), and autodiff accumulates the 9/16
    placement structure (``_PACK_PLACEMENTS``) back onto the 3x3 gradient
    automatically."""
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"phase_pack_kernel_jnp expects 3x3, got {kh}x{kw}")
    out = jnp.zeros((2, 2, 4, ci, 4, co), w.dtype)
    for aa, bb, pq, rs, a, b in _PACK_PLACEMENTS:
        out = out.at[aa, bb, pq, :, rs, :].set(w[a, b])
    return out.reshape(2, 2, 4 * ci, 4 * co)


def phase_bias(bias: jax.Array) -> jax.Array:
    """[C] bias -> its packed [4C] form (phase-major layout: channel
    (phi)*C + c reads bias[c], i.e. a 4x tile)."""
    return jnp.tile(bias, 4)


def mirrored_upconv_matrix(kernel):
    """[2, 2, Ci, Co] transpose-conv kernel -> the packed ``[Ci, 4Co]``
    matmul matrix, columns phase-major ((dy*2+dx)*Co + c), kernel spatially
    MIRRORED — ``lax.conv_transpose`` scatters ``k[1-p, 1-q]`` into block
    offset (p, q). The single source of the layout shared by
    :func:`phase_upconv_matmul`, :func:`phase_upconv_weights`, and
    ``models.unet.matmul_upconv``; works on numpy and jax arrays alike."""
    kh, kw, ci, co = kernel.shape
    if (kh, kw) != (2, 2):
        raise ValueError(f"mirrored_upconv_matrix expects 2x2, got {kh}x{kw}")
    return kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(ci, 4 * co)


def phase_upconv_matmul(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        dtype=jnp.bfloat16) -> jax.Array:
    """Differentiable packed 2x2/stride-2 transpose conv: [B, h, w, Ci] ->
    packed [B, h, w, 4Co] as ONE matmul (models.unet.matmul_upconv without
    the trailing depth-to-space — the output feeds packed decoder convs).
    ``kernel`` uses the nn.ConvTranspose convention ([2, 2, Ci, Co], applied
    spatially flipped by lax.conv_transpose), so checkpoints interoperate."""
    cin = x.shape[-1]
    co = kernel.shape[-1]
    b, h, w, _ = x.shape
    wr = mirrored_upconv_matrix(kernel.astype(dtype))
    y = jnp.dot(x.astype(dtype).reshape(b * h * w, cin), wr,
                preferred_element_type=jnp.float32)
    y = y + phase_bias(bias).astype(jnp.float32)
    return y.astype(dtype).reshape(b, h, w, 4 * co)


def phase_head_matmul(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array) -> jax.Array:
    """Packed 1x1 head: [B, h, w, 4C] @ [1, 1, C, O] -> packed [B, h, w, 4O]
    (block-diagonal in the phase groups, computed as a per-phase matmul)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    o = kernel.shape[-1]
    y = jnp.einsum("bhwpc,co->bhwpo", x.reshape(b, h, w, 4, c),
                   kernel[0, 0].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)
    return y.reshape(b, h, w, 4 * o)


def phase_pool(x: jax.Array) -> jax.Array:
    """Packed-domain 2x2/stride-2 max-pool: [B, h, w, 4C] -> [B, h, w, C].

    The four phase groups of a packed pixel ARE that pixel's 2x2 pool
    window, so the pool is an elementwise max over the phase axis and the
    result is the UNPACKED next-level tensor.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    return jnp.max(x.reshape(b, h, w, 4, c), axis=3)


def phase_upconv_weights(k, bias=None) -> Tuple[np.ndarray, np.ndarray]:
    """2x2/stride-2 transpose-conv kernel [2, 2, Ci, Co] (the jax
    ``conv_transpose`` HWIO layout: I = Ci, O = Co) to its packed matmul
    form ``[Ci, 4Co]`` with the matching [4Co] bias.

    With stride == kernel size the scattered 2x2 blocks are disjoint, and
    ``lax.conv_transpose`` scatters the MIRRORED kernel (measured:
    ``y[2i+p, 2j+q, o] = sum_c in[i,j,c] * k[1-p, 1-q, c, o]``) — one matmul
    whose output is already phase-packed.
    """
    k = np.asarray(k)
    co = k.shape[-1]
    m = mirrored_upconv_matrix(k)
    if bias is None:
        return m, np.zeros((4 * co,), k.dtype)
    return m, np.tile(np.asarray(bias), 4)


def phase_head_kernel(k) -> np.ndarray:
    """1x1 head kernel [1, 1, C, O] -> block-diagonal packed [1, 1, 4C, 4O]."""
    k = np.asarray(k)
    _, _, c, o = k.shape
    out = np.zeros((1, 1, 4, c, 4, o), k.dtype)
    for phi in range(4):
        out[0, 0, phi, :, phi, :] = k[0, 0]
    return out.reshape(1, 1, 4 * c, 4 * o)


def phase_crop(x: jax.Array, margin: int) -> jax.Array:
    """Center-crop a packed tensor by ``margin`` full-resolution pixels per
    side. The margin must be even (phase alignment): level-0 skip margins
    are (1368 - 1192) / 2 = 88 at the production geometry."""
    if margin % 2:
        raise ValueError(f"phase crop margin must be even, got {margin}")
    m = margin // 2
    if m == 0:
        return x
    return x[:, m:-m, m:-m, :]


def conv2x2_valid(x: jax.Array, w: jax.Array, preferred=None) -> jax.Array:
    """Plain 2x2 VALID conv (NHWC/HWIO) — the packed-domain conv atom."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=preferred)
