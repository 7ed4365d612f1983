"""Matmul-reformulated backward passes for the 3x3 valid convolution.

MEASURED-NEGATIVE research path (default OFF — ModelConfig.conv_bwd='xla').
History: a per-layer probe in one session (results/r3/bwd_probe2.txt,
TPU v5e-1, batch-2 572-in HeLa shapes) showed XLA's wgrad emitter (a conv
contracting over batch+space with the cotangent as the "kernel") taking
7.1 / 20.8 ms at the enc1 layers — ~50x off the equivalent matmul — and
the im2col reformulation (patches [B*so*so, 9*cin]^T @ cotangent
[B*so*so, cout], f32 MXU accumulation) winning 35.9 -> 12.1 ms total.
A re-run (bwd_probe3.txt) measured those same XLA wgrads at 0.35 ms —
the "pathology" was a degraded chip window — and the decisive
single-session end-to-end A/B (results/r3/train_bwd_ab.txt, the full
scanned-epoch train step) has plain autodiff WINNING: xla 65.9 ms/step
vs auto 73.4 / mm 86.4. Inside the fused step graph XLA schedules its
transpose convs well, while the matmul forms pay the 9x patch
materialization in HBM.

The module stays as the tested, integrated alternative (`wgrad_mm`,
`dgrad_mm`, and the custom-VJP `conv3x3_bias` that routes each gradient
statically per layer) because the per-shape balance is window- and
shape-dependent and the exactness tests (tests/test_conv_bwd.py) make it
free to re-evaluate. The reference has no counterpart (torch autograd
picks cuDNN algos internally, ``/root/reference/network.py:129-192``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def conv3x3_valid(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """NHWC x [B,S,S,Cin], HWIO kernel [3,3,Cin,Cout] -> [B,S-2,S-2,Cout]."""
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, kernel, (1, 1), "VALID",
                                    dimension_numbers=dn)


def _patches9(a: jax.Array, out_hw: int) -> jax.Array:
    """[B,S,S,C] -> [B*out_hw*out_hw, 9*C]: the nine 3x3-tap shifted views
    stacked along a new axis (tap index = 3*dy + dx), flattened row-major so
    each row is [tap0 C..., tap1 C..., ...]."""
    b = a.shape[0]
    c = a.shape[-1]
    pats = jnp.stack([a[:, dy:dy + out_hw, dx:dx + out_hw, :]
                      for dy in range(3) for dx in range(3)], axis=3)
    return pats.reshape(b * out_hw * out_hw, 9 * c)


def wgrad_mm(g: jax.Array, x: jax.Array) -> jax.Array:
    """dK for y = conv3x3_valid(x, K), as one im2col matmul.

    dk[dy,dx,ci,co] = sum_{b,i,j} x[b,i+dy,j+dx,ci] * g[b,i,j,co], computed
    as patches(x) [B*so*so, 9*Cin]^T @ g [B*so*so, Cout] with f32
    accumulation; cast back to the kernel/primal dtype by the caller's VJP.
    """
    b, so, _, cout = g.shape
    cin = x.shape[-1]
    pats = _patches9(x, so)
    gf = g.reshape(b * so * so, cout)
    dk = lax.dot_general(pats, gf, dimension_numbers=(((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return dk.reshape(3, 3, cin, cout)


def dgrad_mm(g: jax.Array, kernel: jax.Array) -> jax.Array:
    """dx for y = conv3x3_valid(x, K): the full correlation with the
    spatially-flipped kernel, as one matmul.

    dx[b,p,q,ci] = sum_{dy,dx,co} g_pad2[b,p+dy,q+dx,co] * K[2-dy,2-dx,ci,co]
    = patches(pad(g, 2)) [B*S*S, 9*Cout] @ K_flip [9*Cout, Cin], f32 accum.
    """
    b, so, _, cout = g.shape
    s = so + 2
    cin = kernel.shape[2]
    gp = jnp.pad(g, ((0, 0), (2, 2), (2, 2), (0, 0)))
    pats = _patches9(gp, s)
    kf = kernel[::-1, ::-1].transpose(0, 1, 3, 2).reshape(9 * cout, cin)
    dx = jnp.dot(pats, kf, preferred_element_type=jnp.float32)
    return dx.reshape(b, s, s, cin)


def auto_wgrad_impl(in_hw: int, cin: int) -> str:
    """Static per-layer wgrad choice from the bwd_probe2.txt per-shape
    shootout (the band where XLA's wgrad emitter measured slow: shallow
    mid-size layers and tiny Cin). NOTE: that shootout was later shown
    window-contaminated and the e2e A/B picks plain 'xla' (module
    docstring); this rule is kept only to make conv_bwd='auto'
    reproducible against the recorded probes."""
    so = in_hw - 2
    if cin <= 4:
        return "mm"
    if 150 <= so <= 320 and cin <= 128:
        return "mm"
    return "xla"


@functools.lru_cache(maxsize=None)
def _make_conv3x3_bias(wgrad: str, dgrad: str):
    @jax.custom_vjp
    def conv(x, kernel, bias):
        return conv3x3_valid(x, kernel) + bias

    def fwd(x, kernel, bias):
        return conv(x, kernel, bias), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        if dgrad == "mm":
            dx = dgrad_mm(g, kernel)
        else:
            (dx,) = jax.linear_transpose(
                lambda x_: conv3x3_valid(x_, kernel), x)(g)
        if wgrad == "mm":
            dk = wgrad_mm(g, x)
        else:
            (dk,) = jax.linear_transpose(
                lambda k_: conv3x3_valid(x, k_), kernel)(g)
        db = jnp.sum(g, axis=(0, 1, 2))
        return dx.astype(x.dtype), dk.astype(kernel.dtype), db

    conv.defvjp(fwd, bwd)
    return conv


def conv3x3_bias(x: jax.Array, kernel: jax.Array, bias: jax.Array, *,
                 wgrad: str = "mm", dgrad: str = "xla") -> jax.Array:
    """conv3x3_valid(x, kernel) + bias with per-gradient backend selection.

    wgrad/dgrad: 'xla' (the transpose convs autodiff would emit) or 'mm'
    (the im2col matmul formulations above — identical math, f32-accumulated
    on the MXU, cast back to the primal dtype).
    """
    if wgrad not in ("xla", "mm") or dgrad not in ("xla", "mm"):
        raise ValueError(f"wgrad/dgrad must be 'xla' or 'mm', got "
                         f"{wgrad!r}/{dgrad!r}")
    return _make_conv3x3_bias(wgrad, dgrad)(x, kernel, bias)
