"""The 23-layer valid-convolution U-Net (Ronneberger et al. 2015) in Flax.

Capability-equivalent redesign of reference ``network.py:8-192``:

* NHWC layout (TPU-native; channels ride the 128-lane dimension so the MXU
  tiles the conv contractions), bf16-capable compute with f32 params/logits.
* Two skip-connection variants (SURVEY.md §2.1):
  - ``paper``  : skips captured *before* max-pool and center-cropped — the
    geometry of the paper's Fig. 1. Default.
  - ``parity`` : skips captured *after* max-pool and zero-padded up — the
    reference as implemented (``network.py:133-134`` captures ``t1`` after
    ``F.max_pool2d``; ``crop_and_concat`` at ``network.py:108-127`` then always
    zero-pads). Same end-to-end size arithmetic (input 16l+60 -> output 16l-124).
* Two init schemes (SURVEY.md §2.1):
  - ``paper``  : He-normal, std = sqrt(2/N), N = k^2 * fan_in, zero biases.
  - ``parity`` : the reference's scheme as written (``network.py:70-105``) —
    first conv std = sqrt(2), every other layer std = 2/sqrt(N) (operator
    precedence makes ``2 / (N) ** 0.5`` bind as ``2 / sqrt(N)``), decoder
    first-conv N summed over both concat sources with their own kernel sizes,
    upconv N using the previous layer's 3x3 kernel, torch-default uniform
    biases.
* Channel-width multiplier (BASELINE config 5: 2x-wide bf16 variant) and
  optional rematerialization of encoder/decoder levels.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_unet.config import ModelConfig


def center_crop_or_pad(a: jax.Array, target_hw: Sequence[int],
                       fill=0) -> jax.Array:
    """Center-crop (if larger) or pad with `fill` (if smaller) NHWC `a` to
    target H,W.

    Generalizes reference ``network.py:108-127`` (``F.pad`` with negative pad
    crops, positive pad zero-fills); offsets truncate toward zero like the
    reference's ``int((A - B) * 0.5)``. `fill` is the padded value in the
    tensor's own encoding — e.g. -8 for shifted-u4 tensors, whose stored
    code for a real zero activation is -8, not 0.
    """
    h, w = a.shape[1], a.shape[2]
    th, tw = target_hw
    dh = int((h - th) * 0.5)
    dw = int((w - tw) * 0.5)
    if dh > 0 or dw > 0:  # crop
        a = a[:, max(dh, 0): max(dh, 0) + min(th, h), max(dw, 0): max(dw, 0) + min(tw, w), :]
    if dh < 0 or dw < 0:  # pad
        ph, pw = max(-dh, 0), max(-dw, 0)
        a = jnp.pad(
            a,
            ((0, 0), (ph, th - a.shape[1] - ph), (pw, tw - a.shape[2] - pw), (0, 0)),
            constant_values=fill,
        )
    return a


def _normal_init(std: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _uniform_init(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _conv_inits(scheme: str, k: int, fan_in: float, *, first: bool = False,
                parity_n: float | None = None):
    """(kernel_init, bias_init) for a conv layer.

    paper : std = sqrt(2 / (k^2 * fan_in)), zero bias.
    parity: std = sqrt(2) for the very first conv (``network.py:70``), else
            2 / sqrt(parity_n); bias ~ U(-1/sqrt(k^2*fan_in), +) (torch default,
            never overridden by the reference).
    """
    if scheme == "paper":
        std = math.sqrt(2.0 / (k * k * fan_in))
        return _normal_init(std), nn.initializers.zeros_init()
    elif scheme == "parity":
        if first:
            std = math.sqrt(2.0)
        else:
            assert parity_n is not None
            std = 2.0 / math.sqrt(parity_n)
        bound = 1.0 / math.sqrt(k * k * fan_in)
        return _normal_init(std), _uniform_init(bound)
    raise ValueError(f"unknown init scheme: {scheme}")


class _PallasConvRelu(nn.Module):
    """3x3 valid conv + bias + ReLU via the fused Pallas tile kernel
    (ops/conv_pallas.py). Parameter tree matches nn.Conv ({kernel, bias}),
    so checkpoints interoperate. Trainable: the kernel carries a custom VJP
    (Pallas forward, XLA transposed-conv backward). Callers' extra nn.relu
    is idempotent on the fused output."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tpu_unet.ops.conv_pallas import conv3x3_bias_relu

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        interpret = jax.default_backend() == "cpu"
        return conv3x3_bias_relu(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), interpret=interpret)


class _Conv3x3CustomBwd(nn.Module):
    """3x3 valid conv + bias with per-layer backward backend selection
    (ops/conv_bwd.py): the forward is XLA's native conv; the weight and/or
    input gradients are the im2col matmul formulations. Research path,
    default OFF — the e2e A/B picked plain autodiff
    (results/r3/train_bwd_ab.txt). Parameter tree matches nn.Conv
    ({kernel, bias}), so checkpoints interoperate."""

    features: int
    wgrad: str = "mm"
    dgrad: str = "xla"
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tpu_unet.ops.conv_bwd import conv3x3_bias

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        return conv3x3_bias(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype), wgrad=self.wgrad, dgrad=self.dgrad)


def _conv3x3_valid(x: jax.Array, k: jax.Array) -> jax.Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                        dimension_numbers=dn)


@jax.custom_vjp
def split_concat_conv3x3(a: jax.Array, b: jax.Array, kernel: jax.Array,
                         bias: jax.Array) -> jax.Array:
    """conv3x3_valid(concat(a, b), kernel) + bias, computed as
    conv(a, K[:, :, :Ca]) + conv(b, K[:, :, Ca:]) + bias — identical math,
    but the concat tensor is never materialized (HBM win at full resolution,
    measured +3% on the serving tiles).

    The backward is routed through the *concat* form's transposes: the split
    form's autodiff backward trips XLA TPU's space-to-batch halo assert at
    small batch (space_to_batch_converter.cc), while the concat form's
    gradients — the exact same cotangents — compile fine. One concat is
    materialized in the backward only."""
    ca = a.shape[-1]
    return (_conv3x3_valid(a, kernel[:, :, :ca])
            + _conv3x3_valid(b, kernel[:, :, ca:]) + bias)


def _scc_fwd(a, b, kernel, bias):
    return split_concat_conv3x3(a, b, kernel, bias), (a, b, kernel)


def _scc_bwd(res, g):
    a, b, kernel = res
    ca = a.shape[-1]
    cat = jnp.concatenate([a, b], axis=-1)
    # conv is linear in each operand: linear_transpose builds the cotangent
    # convs without re-running the primal (unlike jax.vjp).
    (dcat,) = jax.linear_transpose(
        lambda x: _conv3x3_valid(x, kernel), cat)(g)
    (dk,) = jax.linear_transpose(
        lambda k: _conv3x3_valid(cat, k), kernel)(g)
    return dcat[..., :ca], dcat[..., ca:], dk, jnp.sum(g, axis=(0, 1, 2))


split_concat_conv3x3.defvjp(_scc_fwd, _scc_bwd)


class _SplitConcatConv(nn.Module):
    """conv3x3(concat(a, b)) via ``split_concat_conv3x3`` (see its docstring).
    The parameter tree matches nn.Conv over the concatenated input, so
    checkpoints and the torch converter interoperate."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, ca + cb, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        return split_concat_conv3x3(
            a.astype(self.dtype), b.astype(self.dtype),
            kernel.astype(self.dtype), bias.astype(self.dtype))


def matmul_upconv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                  dtype=jnp.bfloat16) -> jax.Array:
    """2x2 stride-2 transposed conv as ONE MXU dot + depth-to-space.

    The stride equals the kernel size, so output windows never overlap and the
    transposed conv is exactly y[b, 2i+dy, 2j+dx, co] = x[b,i,j,:] @ k[dy,dx]
    — a single [B*H*W, Cin] x [Cin, 4*Cout] matmul followed by a pixel
    shuffle. `kernel` uses the nn.ConvTranspose convention ([2,2,Cin,Cout],
    applied spatially flipped by lax.conv_transpose — flipped here so both
    paths consume the same checkpoints). Shared by _MatmulUpconv and the
    quantized serving forward (infer/quant.py)."""
    from tpu_unet.ops.phase import mirrored_upconv_matrix

    cin = x.shape[-1]
    co = kernel.shape[-1]
    x = x.astype(dtype)
    b, h, w, _ = x.shape
    # [dy, dx, cin, co] -> [cin, dy*dx*co]: the dot's N axis carries the
    # four output sub-pixels contiguously per channel block.
    wr = mirrored_upconv_matrix(kernel.astype(dtype))
    y = jnp.dot(x.reshape(b * h * w, cin), wr,
                preferred_element_type=jnp.float32)
    y = (y.reshape(b, h, w, 2, 2, co)
         + bias.astype(jnp.float32)).astype(dtype)
    # [b, h, dy, w, dx, co] -> [b, 2h, 2w, co] (depth-to-space)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, co)


class _MatmulUpconv(nn.Module):
    """`matmul_upconv` as a Flax module with nn.ConvTranspose's parameter
    tree ({kernel [2,2,Cin,Cout], bias}), so checkpoints interoperate;
    equality is tested in tests/test_model.py."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        co = self.features
        kernel = self.param("kernel", self.kernel_init, (2, 2, cin, co),
                            self.param_dtype)
        bias = self.param("bias", self.bias_init, (co,), self.param_dtype)
        return matmul_upconv(x, kernel, bias, dtype=self.dtype)


@jax.custom_vjp
def split_concat_conv2x2(a: jax.Array, b: jax.Array, ka: jax.Array,
                         kb: jax.Array) -> jax.Array:
    """Packed-domain analog of ``split_concat_conv3x3`` (same rationale):
    conv2x2(concat(a, b), concat_k) computed as conv(a, ka) + conv(b, kb)
    without materializing the concat, with the backward routed through the
    *concat* form's transposes — the split form's autodiff gradients are the
    pattern that trips XLA TPU's space-to-batch halo assert at small batch
    (space_to_batch_converter.cc); the concat form's identical cotangents
    compile fine. One packed concat is materialized in the backward only."""
    from tpu_unet.ops.phase import conv2x2_valid

    return conv2x2_valid(a, ka) + conv2x2_valid(b, kb)


def _scc2_fwd(a, b, ka, kb):
    return split_concat_conv2x2(a, b, ka, kb), (a, b, ka, kb)


def _scc2_bwd(res, g):
    from tpu_unet.ops.phase import conv2x2_valid

    a, b, ka, kb = res
    ca = a.shape[-1]
    cat = jnp.concatenate([a, b], axis=-1)
    k = jnp.concatenate([ka, kb], axis=2)
    (dcat,) = jax.linear_transpose(
        lambda x: conv2x2_valid(x, k), cat)(g)
    (dk,) = jax.linear_transpose(
        lambda kk: conv2x2_valid(cat, kk), k)(g)
    return dcat[..., :ca], dcat[..., ca:], dk[:, :, :ca], dk[:, :, ca:]


split_concat_conv2x2.defvjp(_scc2_fwd, _scc2_bwd)


class _PhaseConv(nn.Module):
    """3x3 valid conv executed in the 2x2 phase-packed domain
    (ops/phase.py): input/output are packed [B, h, w, 4C] tensors; the
    parameter tree stays the canonical {kernel [3,3,Ci,Co], bias [Co]} of
    nn.Conv (packed per call via the differentiable embedding), so
    checkpoints interoperate. Linear + bias; callers apply the ReLU."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        from tpu_unet.ops import phase as ph

        cin = xp.shape[-1] // 4
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        kp = ph.phase_pack_kernel_jnp(kernel.astype(self.dtype))
        y = ph.conv2x2_valid(xp.astype(self.dtype), kp)
        return y + ph.phase_bias(bias).astype(y.dtype)


class _PhaseSplitConcatConv(nn.Module):
    """Decoder first conv in the packed domain: conv(concat(skip, up)) with
    the concat eliminated by kernel splitting (conv(a, K[:Ca]) +
    conv(b, K[Ca:])) — both operands stay phase-packed and the packed concat
    tensor is never materialized. Parameter tree matches nn.Conv over the
    concatenated input ({kernel [3,3,Ca+Cb,Co], bias})."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ap: jax.Array, bp: jax.Array) -> jax.Array:
        from tpu_unet.ops import phase as ph

        ca, cb = ap.shape[-1] // 4, bp.shape[-1] // 4
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, ca + cb, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        k = kernel.astype(self.dtype)
        y = split_concat_conv2x2(ap.astype(self.dtype),
                                 bp.astype(self.dtype),
                                 ph.phase_pack_kernel_jnp(k[:, :, :ca]),
                                 ph.phase_pack_kernel_jnp(k[:, :, ca:]))
        return y + ph.phase_bias(bias).astype(y.dtype)


class _PhaseUpconv(nn.Module):
    """2x2/stride-2 transpose conv emitting a phase-packed output: with
    stride == kernel size the scattered blocks are disjoint, so packed it is
    ONE [.., Ci] @ [Ci, 4Co] matmul (ops/phase.py phase_upconv_matmul).
    Parameter tree matches nn.ConvTranspose ({kernel [2,2,Ci,Co], bias})."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from tpu_unet.ops import phase as ph

        kernel = self.param("kernel", self.kernel_init,
                            (2, 2, x.shape[-1], self.features),
                            self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        return ph.phase_upconv_matmul(x, kernel.astype(self.dtype),
                                      bias.astype(self.dtype),
                                      dtype=self.dtype)


class _PhaseHead(nn.Module):
    """Packed 1x1 head (block-diagonal over phase groups). Parameter tree
    matches nn.Conv ({kernel [1,1,C,O], bias [O]})."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        from tpu_unet.ops import phase as ph

        cin = xp.shape[-1] // 4
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, cin, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        return ph.phase_head_matmul(xp.astype(self.dtype),
                                    kernel.astype(self.dtype),
                                    bias.astype(self.dtype))


class UNet(nn.Module):
    """Valid-conv U-Net. Input NHWC [B, H, W, in_channels] with H = W a valid
    input size (core.geometry); output f32 logits [B, H-ctx, W-ctx, num_classes].
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.skip_variant not in ("paper", "parity"):
            raise ValueError(f"skip_variant must be 'paper' or 'parity', got {cfg.skip_variant!r}")
        if cfg.conv_bwd not in ("auto", "mm", "xla"):
            raise ValueError(f"conv_bwd must be 'auto', 'mm' or 'xla', got {cfg.conv_bwd!r}")
        if cfg.phase_level0:
            if cfg.conv_impl != "xla":
                raise ValueError("phase_level0 requires conv_impl='xla' "
                                 "(the phase path replaces the level-0 convs)")
            if x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError(
                    f"phase_level0 needs even H, W (got {x.shape[1]}x"
                    f"{x.shape[2]}); every valid U-Net input size is even")
            from tpu_unet.ops import phase as ph
        # Reject sizes the valid-conv geometry can't carry (pooling would
        # silently floor odd extents and misalign the skips).
        from tpu_unet.core.geometry import output_size_for_input
        for dim in (1, 2):
            try:
                output_size_for_input(x.shape[dim], cfg.depth)
            except ValueError as e:
                raise ValueError(
                    f"input axis {dim} has size {x.shape[dim]}, not a valid U-Net "
                    f"input size for depth {cfg.depth} (use core.geometry."
                    f"input_size_compute)") from e
        widths = cfg.widths
        cdt = jnp.dtype(cfg.compute_dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        scheme = cfg.init_scheme

        def conv3(x, feat, name, *, first=False, parity_n=None):
            fan_in = x.shape[-1]
            kinit, binit = _conv_inits(scheme, 3, fan_in, first=first, parity_n=parity_n)
            if cfg.conv_impl == "pallas":
                return _PallasConvRelu(
                    feat, kernel_init=kinit, bias_init=binit, name=name,
                    dtype=cdt, param_dtype=pdt,
                )(x)
            if cfg.conv_bwd != "xla":
                from tpu_unet.ops.conv_bwd import auto_wgrad_impl
                wg = (auto_wgrad_impl(x.shape[1], x.shape[-1])
                      if cfg.conv_bwd == "auto" else cfg.conv_bwd)
                if wg == "mm":
                    return _Conv3x3CustomBwd(
                        feat, wgrad="mm", dgrad="xla", name=name,
                        kernel_init=kinit, bias_init=binit,
                        dtype=cdt, param_dtype=pdt,
                    )(x)
            return nn.Conv(
                feat, (3, 3), padding="VALID", name=name,
                kernel_init=kinit, bias_init=binit,
                dtype=cdt, param_dtype=pdt,
            )(x)

        def upconv(x, feat, name, packed=False):
            fan_in = x.shape[-1]
            if scheme == "paper":
                kinit, binit = _conv_inits("paper", 2, fan_in)
            else:
                # ``network.py:85,90,95,100``: upconv std uses the previous 3x3
                # kernel size in N; torch ConvTranspose2d default bias bound is
                # 1/sqrt(out_ch * k^2) (fan computed on the [in,out,k,k] weight).
                kinit = _normal_init(2.0 / math.sqrt(fan_in * 9.0))
                binit = _uniform_init(1.0 / math.sqrt(feat * 4.0))
            if packed:
                return _PhaseUpconv(
                    feat, name=name, kernel_init=kinit, bias_init=binit,
                    dtype=cdt, param_dtype=pdt,
                )(x)
            if cfg.upconv_impl == "matmul":
                return _MatmulUpconv(
                    feat, name=name, kernel_init=kinit, bias_init=binit,
                    dtype=cdt, param_dtype=pdt,
                )(x)
            return nn.ConvTranspose(
                feat, (2, 2), strides=(2, 2), padding="VALID", name=name,
                kernel_init=kinit, bias_init=binit,
                dtype=cdt, param_dtype=pdt,
            )(x)

        def phase_conv3(xp, feat, name, *, cin, first=False, parity_n=None):
            # cin is the CANONICAL (unpacked) fan-in: the parameter tree and
            # its init statistics are those of the plain 3x3 conv.
            kinit, binit = _conv_inits(scheme, 3, cin, first=first,
                                       parity_n=parity_n)
            return _PhaseConv(feat, kernel_init=kinit, bias_init=binit,
                              name=name, dtype=cdt, param_dtype=pdt)(xp)

        def enc_level(x, d):
            if cfg.phase_level0 and d == 0:
                # Packed level 0: s2d once on the raw input, 2x2 convs at 4x
                # channels; returns the PACKED conv2 output (the caller's
                # phase_pool unpacks it into the level-1 tensor).
                xp = ph.space_to_depth(x)
                xp = nn.relu(phase_conv3(xp, widths[0], "enc0_conv1",
                                         cin=x.shape[-1], first=True,
                                         parity_n=x.shape[-1] * 9.0))
                return nn.relu(phase_conv3(xp, widths[0], "enc0_conv2",
                                           cin=widths[0],
                                           parity_n=widths[0] * 9.0))
            x = nn.relu(conv3(x, widths[d], f"enc{d}_conv1",
                              first=(d == 0),
                              parity_n=x.shape[-1] * 9.0))
            x = nn.relu(conv3(x, widths[d], f"enc{d}_conv2",
                              parity_n=x.shape[-1] * 9.0))
            return x

        x = x.astype(cdt)
        skips = []
        for d in range(cfg.depth):
            if cfg.remat:
                # flax lifted transforms need the Module as the function's
                # first argument (the closure-only form fails to bind the
                # scope); param names stay flat, so checkpoints interoperate.
                x = nn.remat(lambda mdl, x, d: enc_level(x, d),
                             static_argnums=(2,))(self, x, d)
            else:
                x = enc_level(x, d)
            if cfg.skip_variant == "paper":
                skips.append(x)   # packed at d=0 under phase_level0
            if cfg.phase_level0 and d == 0:
                # pool0 in the packed domain: max over the four phase groups;
                # the result is already the UNPACKED level-1 tensor.
                x = ph.phase_pool(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if cfg.skip_variant == "parity":
                skips.append(x)

        # Bottleneck
        x = nn.relu(conv3(x, widths[cfg.depth], "bottleneck_conv1",
                          parity_n=x.shape[-1] * 9.0))
        x = nn.relu(conv3(x, widths[cfg.depth], "bottleneck_conv2",
                          parity_n=x.shape[-1] * 9.0))

        for d in reversed(range(cfg.depth)):
            if cfg.phase_level0 and d == 0:
                # Packed decoder level 0: the upconv emits phase-packed
                # output directly (one matmul); the skip arrives packed
                # ('paper': the packed enc0 output, cropped in the packed
                # domain — level-0 margins are always even) or is packed here
                # ('parity': the half-res post-pool skip is zero-padded to
                # full res exactly as the plain path does, then s2d — a cheap
                # 64-ch relabel); the concat is eliminated by kernel
                # splitting; the head runs packed and the ONLY depth-to-space
                # in the network runs on the logits after it.
                x = upconv(x, widths[0], "up0", packed=True)
                if cfg.skip_variant == "paper":
                    skip_p = center_crop_or_pad(skips[0], x.shape[1:3])
                else:
                    skip_full = center_crop_or_pad(
                        skips[0], (2 * x.shape[1], 2 * x.shape[2]))
                    skip_p = ph.space_to_depth(skip_full)
                n1 = widths[0] * 9.0 + widths[0] * 4.0
                ki, bi = _conv_inits(scheme, 3, 2 * widths[0], parity_n=n1)
                x = nn.relu(_PhaseSplitConcatConv(
                    widths[0], name="dec0_conv1", kernel_init=ki,
                    bias_init=bi, dtype=cdt, param_dtype=pdt)(skip_p, x))
                x = nn.relu(phase_conv3(x, widths[0], "dec0_conv2",
                                        cin=widths[0],
                                        parity_n=widths[0] * 9.0))
                continue
            x = upconv(x, widths[d], f"up{d}")
            skip = center_crop_or_pad(skips[d], x.shape[1:3])
            # Decoder first conv: parity N sums both concat sources with their
            # own kernel sizes (``network.py:87,92,97,102``): skip source is a
            # 3x3 conv output, upconv source a 2x2 kernel.
            n1 = widths[d] * 9.0 + widths[d] * 4.0
            if cfg.split_concat_conv and cfg.conv_impl == "xla":
                x = nn.relu(_SplitConcatConv(
                    widths[d], name=f"dec{d}_conv1",
                    kernel_init=_conv_inits(scheme, 3, 2 * widths[d],
                                            parity_n=n1)[0],
                    bias_init=_conv_inits(scheme, 3, 2 * widths[d],
                                          parity_n=n1)[1],
                    dtype=cdt, param_dtype=pdt,
                )(skip, x))
            else:
                x = jnp.concatenate([skip, x], axis=-1)
                x = nn.relu(conv3(x, widths[d], f"dec{d}_conv1", parity_n=n1))
            x = nn.relu(conv3(x, widths[d], f"dec{d}_conv2",
                              parity_n=x.shape[-1] * 9.0))

        # 1x1 head to num_classes, no activation (``network.py:58,190``).
        # Canonical fan-in: under phase_level0 x is packed (4x channels) but
        # the parameter tree and its init stats stay the plain conv's.
        fan_in = x.shape[-1] // 4 if cfg.phase_level0 else x.shape[-1]
        if scheme == "paper":
            kinit, binit = _conv_inits("paper", 1, fan_in)
        else:
            # ``network.py:105``: N uses the previous layer's 3x3 kernel.
            kinit = _normal_init(2.0 / math.sqrt(fan_in * 9.0))
            binit = _uniform_init(1.0 / math.sqrt(fan_in * 1.0))
        if cfg.phase_level0:
            x = _PhaseHead(cfg.num_classes, name="head",
                           kernel_init=kinit, bias_init=binit,
                           dtype=cdt, param_dtype=pdt)(x)
            x = ph.depth_to_space(x)
        else:
            x = nn.Conv(cfg.num_classes, (1, 1), padding="VALID", name="head",
                        kernel_init=kinit, bias_init=binit,
                        dtype=cdt, param_dtype=pdt)(x)
        return x.astype(jnp.float32)
