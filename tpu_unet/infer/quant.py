"""Int8 quantized U-Net inference (serving path toward the 1000-tiles/s
BASELINE target).

The reference has no quantization (eager f32 torch, ``network.py``); this is
TPU-native capability the bf16 ceiling demands: the v5e MXU runs int8 at 2x
the bf16 rate, and round-1 measured the model's bf16 ceiling at ~500 tiles/s
(results/README.md). Design:

* post-training quantization, symmetric: per-tensor activation scales
  (calibrated: abs-max over sample tiles / 127) + per-output-channel weight
  scales;
* the 3x3 convs with cin/cout >= `min_channels` (default 128 — 76% of the
  model's FLOPs at serving tile sizes) run int8 x int8 -> int32 with a fused
  scale+bias+ReLU+requantize epilogue and int8 activations in HBM (4x less
  activation traffic than f32). Two backends: 'xla' (lax.conv in int8 — the
  measured default: 330-550 T/s per layer, results/r2/shootout.txt) and
  'pallas' (fused MXU tiles, ops/conv_tiles.py — measured slower at every
  serving shape; kept as the documented kernel-research path and oracle);
* max-pool operates on int8 directly (order-preserving); upconvs, the
  low-channel convs, and the 1x1 head stay bf16; decoder concats happen IN
  int8 (the skip requantizes in place — round(q*s_skip/s_cat) is exactly
  the requantize of the dequantized value — and float-sourced skips are
  captured pre-quantized at the concat scale), so the full-resolution bf16
  concat tensor never exists.

Numerics contract is validated in tests/test_quant.py: logits close to bf16,
prediction IoU drop < 0.5% on the synthetic eval set (VERDICT r1 item 2).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, FrozenSet, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_unet.config import ModelConfig
from tpu_unet.models import center_crop_or_pad
from tpu_unet.ops.conv_tiles import (
    conv3x3_fused,
    conv3x3_int4_acc,
    conv3x3_int4_xla,
    conv3x3_int8_xla,
    int4_epilogue,
    quantize_activations,
    quantize_activations_s4,
    quantize_activations_u4s,
    quantize_weights,
    quantize_weights_int4,
    requantize_i8_to_u4s,
    requantize_u4s_to_i8,
)

# 4-bit activation scales derive from the same calibration as int8: the
# clip range (post-ReLU max, or abs-max for signed) is shared, only the
# level count changes — u4 has 16 levels (shifted-u4 encoding), signed
# s4 has 15.
_U4 = 127.0 / 15.0
_S4 = 127.0 / 7.0


def _conv_names(cfg: ModelConfig) -> Tuple[str, ...]:
    names = []
    for d in range(cfg.depth):
        names += [f"enc{d}_conv1", f"enc{d}_conv2"]
    names += ["bottleneck_conv1", "bottleneck_conv2"]
    for d in reversed(range(cfg.depth)):
        names += [f"dec{d}_conv1", f"dec{d}_conv2"]
    return tuple(names)


def default_quant_names(cfg: ModelConfig, min_channels: int = 128) -> FrozenSet[str]:
    """3x3 convs whose cin (the MXU contraction depth) reaches `min_channels`
    — the int8-profitable set. Measured per layer at serving shapes
    (results/r2/shootout_lowch.txt): int8 XLA wins at every cin >= 128 layer
    (+23%..+51%) and loses at every cin == 64 layer, regardless of cout."""
    w = cfg.widths
    out = set()
    for d in range(cfg.depth):
        cin1 = cfg.in_channels if d == 0 else w[d - 1]
        if cin1 >= min_channels:
            out.add(f"enc{d}_conv1")
        if w[d] >= min_channels:
            out.add(f"enc{d}_conv2")
    if w[cfg.depth - 1] >= min_channels:
        out.add("bottleneck_conv1")
    if w[cfg.depth] >= min_channels:
        out.add("bottleneck_conv2")
    for d in range(cfg.depth):
        if 2 * w[d] >= min_channels:
            out.add(f"dec{d}_conv1")
        if w[d] >= min_channels:
            out.add(f"dec{d}_conv2")
    return frozenset(out)


def default_int4_names(cfg: ModelConfig, min_channels: int = 128) -> FrozenSet[str]:
    """The int4-profitable conv set: every int8-profitable (cin >=
    `min_channels`) conv OUTSIDE the level-0 neighborhood. v5e runs int4 x
    int4 at ~2x the int8 MXU rate at every one of these shapes (234-826 vs
    157-211 T/s, results/r3/int4_probe2.txt). Level 0 is excluded: in the
    production phase-packed formulation it has its own formulation
    (ops/phase.py), and it carries the finest spatial detail — the 16-level
    activation encoding is spent where the FLOPs are, not where the
    boundary pixels are decided."""
    level0 = {"enc0_conv1", "enc0_conv2", "dec0_conv1", "dec0_conv2"}
    return frozenset(default_quant_names(cfg, min_channels) - level0)


def calibrate(model, params, sample_batch: jax.Array) -> Dict[str, float]:
    """Run the float model on representative tiles, record per-tensor abs-max
    activation scales. Returns {name: scale} for every conv output (post-ReLU
    max / 127), every upconv output, and the input tensor.

    `sample_batch` [B, H, W, 1] should be normalized like serving inputs.
    """
    _, state = model.apply(params, sample_batch,
                           capture_intermediates=True,
                           mutable=["intermediates"])
    inter = state["intermediates"]
    scales: Dict[str, float] = {
        "input": float(jnp.max(jnp.abs(sample_batch))) / 127.0,
    }
    for name, sub in inter.items():
        if name == "__call__":
            continue
        out = sub["__call__"][0]
        if name.startswith(("enc", "dec", "bottleneck")):
            # conv outputs are pre-ReLU; the consumed tensor is post-ReLU
            m = float(jnp.maximum(jnp.max(out), 0.0))
        else:  # up{d} (signed) and head (unused)
            m = float(jnp.max(jnp.abs(out)))
        scales[name] = max(m, 1e-6) / 127.0
    return scales


@dataclasses.dataclass
class QuantParams:
    """Preprocessed serving parameters: int8/int4 kernels + fused scale
    vectors for quantized convs, bf16 tensors for the float remainder.
    `qnames` (int8) and `q4names` (int4, w4a4 serving) are disjoint."""

    cfg: ModelConfig
    qnames: FrozenSet[str]
    scales: Dict[str, float]
    qconv: Dict[str, Tuple[jax.Array, jax.Array, jax.Array]]  # name -> (w_q, s_w, bias)
    # name -> (kernel, bias); kernels are bf16 except the level-0 convs
    # (_LEVEL0_CONVS), kept f32 so the phase engine quantizes them from full
    # precision — bf16 compute paths cast at use.
    fconv: Dict[str, Tuple[jax.Array, jax.Array]]
    q4names: FrozenSet[str] = frozenset()
    q4conv: Dict[str, Tuple[jax.Array, jax.Array, jax.Array]] = \
        dataclasses.field(default_factory=dict)  # name -> (w_q4, s_w4, bias)


# The level-0 convs the phase engine may re-quantize at serving time: their
# fconv kernels stay float32 (quantizing from a bf16-rounded copy would cost
# ~1 LSB of per-channel scale fidelity for nothing — the tensors are tiny).
_LEVEL0_CONVS = ("enc0_conv1", "enc0_conv2", "dec0_conv1", "dec0_conv2")


def prepare_quant_params(cfg: ModelConfig, params, scales: Dict[str, float],
                         qnames: Optional[FrozenSet[str]] = None,
                         q4names: Optional[FrozenSet[str]] = None) -> QuantParams:
    if qnames is None:
        qnames = default_quant_names(cfg)
    q4names = frozenset(q4names or ())
    qnames = frozenset(qnames) - q4names     # int4 takes precedence
    p = params["params"]
    qconv, fconv, q4conv = {}, {}, {}
    for name in _conv_names(cfg):
        kernel = p[name]["kernel"].astype(jnp.float32)
        bias = p[name]["bias"].astype(jnp.float32)
        if name in q4names:
            w_q, s_w = quantize_weights_int4(kernel)
            q4conv[name] = (w_q, s_w, bias)
        elif name in qnames:
            w_q, s_w = quantize_weights(kernel)
            qconv[name] = (w_q, s_w, bias)
        else:
            fconv[name] = (kernel if name in _LEVEL0_CONVS
                           else kernel.astype(jnp.bfloat16), bias)
    for d in range(cfg.depth):
        fconv[f"up{d}"] = (p[f"up{d}"]["kernel"].astype(jnp.bfloat16),
                           p[f"up{d}"]["bias"].astype(jnp.float32))
    fconv["head"] = (p["head"]["kernel"].astype(jnp.bfloat16),
                     p["head"]["bias"].astype(jnp.float32))
    return QuantParams(cfg=cfg, qnames=qnames, scales=dict(scales),
                       qconv=qconv, fconv=fconv, q4names=q4names,
                       q4conv=q4conv)


class QuantInference:
    """Mixed int8/bf16 forward with the exact UNet geometry (both skip
    variants). `impl`: 'xla' (int8 lax.conv — the measured winner at every
    serving shape, results/r2/shootout.txt) or 'pallas' (fused MXU tiles —
    measured slower; kernel-research path/oracle). `layer_impl` overrides the
    impl per conv name ({'dec1_conv1': 'pallas', ...}) so each layer can run
    whichever backend measured fastest at its shape. `block_rows=None` uses
    the measured per-shape winner config (ops/conv_tiles.best_config).
    `upconv_impl`: 'xla' (lax.conv_transpose — measured faster at all four
    upconv shapes) or 'matmul' (one dot + depth-to-space)."""

    def __init__(self, qp: QuantParams, impl: str = "xla",
                 block_rows: Optional[int] = None,
                 interpret: Optional[bool] = None,
                 layer_impl: Optional[Dict[str, str]] = None,
                 upconv_impl: str = "xla",
                 phase_level0: Optional[str] = None):
        if impl not in ("pallas", "xla"):
            raise ValueError(f"impl must be 'pallas' or 'xla', got {impl!r}")
        if phase_level0 not in (None, "bf16", "int8"):
            raise ValueError(
                f"phase_level0 must be None, 'bf16' or 'int8', got "
                f"{phase_level0!r}")
        if phase_level0 and qp.cfg.skip_variant != "paper":
            raise ValueError("phase_level0 requires the paper skip variant "
                             "(the parity skip is captured post-pool, "
                             "outside the packed domain)")
        if phase_level0 and qp.cfg.in_channels != 1:
            raise ValueError("phase_level0 expects the 1-channel input")
        self.qp = qp
        self.impl = impl
        self.block_rows = block_rows
        self.interpret = interpret
        self.layer_impl = dict(layer_impl or {})
        self.upconv_impl = upconv_impl
        # The measured-negative level-0 formulations (pair_level0,
        # fused_enc0/fused_concat) live in quant_research.py
        # (ResearchQuantInference) — quarantined so this production forward
        # reads as (phase | plain) x (int8 | int4).
        # Phase packing (ops/phase.py): run the level-0 neighborhood on the
        # 2x2 space-to-depth relabeling — 3x3 convs become 2x2 convs at 4x
        # the channels (full MXU lanes, and the int8-profitable cin>=128
        # regime), pool0 a channel max, up0 one matmul, and the decoder
        # concat two split-kernel convs (each source keeps its own
        # activation scale; nothing is requantized). 'bf16' packs only the
        # float convs; 'int8' additionally quantizes enc0_conv2/dec0_conv2
        # (packed cin = 4*w0 >= 128). Exactness: tests/test_phase.py +
        # tests/test_quant.py; hardware verdict in results/r3/.
        self.phase_level0 = phase_level0
        self._phase = self._phase_prep(phase_level0) if phase_level0 else None

    # -- primitives ---------------------------------------------------------

    def _interp(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        return jax.default_backend() == "cpu"

    def _deq(self, v: jax.Array, s) -> jax.Array:
        """Dequantize by encoding tag: None = float already; float = int8
        at that scale; ('u4s', s4) = shifted-u4 (value = (q + 8) * s4)."""
        if s is None:
            return v
        if isinstance(s, tuple):
            return ((v.astype(jnp.float32) + 8.0)
                    * jnp.float32(s[1])).astype(jnp.bfloat16)
        return v.astype(jnp.bfloat16) * jnp.bfloat16(s)

    @staticmethod
    def _blockdiag(k: jax.Array) -> jax.Array:
        """[kh, kw, ci, co] -> [kh, kw, 2ci, 2co] with k on the diagonal:
        a conv of the channel-paired tensor that keeps images independent."""
        z = jnp.zeros_like(k)
        return jnp.concatenate([jnp.concatenate([k, z], -1),
                                jnp.concatenate([z, k], -1)], -2)

    def _phase_prep(self, mode: str) -> Dict[str, object]:
        """Host-side (once per engine) packing of the level-0 parameters
        into their phase-domain forms — see ops/phase.py for the math.
        Channel convention is phase-major ((p*2+q)*C + c), so every bias /
        scale vector lifts by ``np.tile(v, 4)``."""
        from tpu_unet.ops.phase import phase_pack_kernel, phase_upconv_weights

        qp = self.qp
        w0 = qp.cfg.widths[0]
        bad_q4 = sorted(qp.q4names & set(_LEVEL0_CONVS))
        if bad_q4:
            raise ValueError(
                "phase_level0 serves level 0 in bf16/int8; int4 level-0 "
                f"convs are unsupported (q4names contains: {bad_q4})")
        # level0_pair folds calibration scales whenever a level-0 conv is
        # quantized — under mode='bf16' that still happens for any level-0
        # conv in qnames, so the friendly check must fire then too.
        if (mode == "int8"
                or not {"enc0_conv2", "dec0_conv1",
                        "dec0_conv2"}.isdisjoint(qp.qnames)):
            missing = [k for k in ("enc0_conv1", "enc0_conv2", "up0",
                                   "dec0_conv1", "dec0_conv2")
                       if k not in qp.scales]
            if missing:
                raise ValueError(
                    "phase_level0 needs the full calibration scale set "
                    f"(calibrate() records it); missing: {missing}")
        P: Dict[str, object] = {"mode": mode}

        def packed_f(kernel, bias):
            k = jnp.asarray(phase_pack_kernel(np.asarray(kernel, np.float32)),
                            jnp.bfloat16)
            return k, jnp.asarray(np.tile(np.asarray(bias, np.float32), 4))

        def pack_i8(w_q):
            return jnp.asarray(phase_pack_kernel(
                np.asarray(w_q, np.int32)).astype(np.int8))

        def fold(s_in: float, s_w, bias, s_out: float):
            """Lift the int8 epilogue vectors to the packed channel order:
            y = relu(acc * alpha + beta), alpha = s_in*s_w/s_out."""
            alpha = np.tile(np.asarray(s_in * s_w, np.float32) / s_out, 4)
            beta = np.tile(np.asarray(bias, np.float32) / s_out, 4)
            return jnp.asarray(alpha), jnp.asarray(beta)

        # enc0_conv1 always runs bf16 (packed cin is 4)
        if "enc0_conv1" in qp.qnames:
            raise ValueError(
                "phase_level0 runs enc0_conv1 in bf16 (its packed cin is 4 "
                "— far below the int8-profitable contraction depth); build "
                "the QuantParams with enc0_conv1 outside qnames")
        k1, b1 = qp.fconv["enc0_conv1"]
        P["enc0_conv1"] = packed_f(k1, b1)

        def level0_pair(name: str, s_in_key: str):
            if name in qp.qnames:        # reuse the production int8 weights
                w_q, s_w, bias = qp.qconv[name]
            elif mode == "int8":
                k, b = qp.fconv[name]
                w_q, s_w = quantize_weights(jnp.asarray(k, jnp.float32))
                bias = b
            else:
                return ("bf16",) + packed_f(*qp.fconv[name])
            alpha, beta = fold(qp.scales[s_in_key], s_w, bias,
                               qp.scales[name])
            return ("int8", pack_i8(w_q), alpha, beta, qp.scales[name])

        P["enc0_conv2"] = level0_pair("enc0_conv2", "enc0_conv1")
        P["dec0_conv2"] = level0_pair("dec0_conv2", "dec0_conv1")

        # up0 as one matmul: [w(d1), 4*w0] packed, output already in phase
        ku, bu = qp.fconv["up0"]
        m, bm = phase_upconv_weights(np.asarray(ku, np.float32),
                                     np.asarray(bu, np.float32))
        P["up0"] = (jnp.asarray(m, jnp.bfloat16), jnp.asarray(bm))

        # dec0_conv1 split by source (skip | up — the production concat
        # order), each half packed separately; int8 halves share the full
        # kernel's per-output-channel weight scales.
        if "dec0_conv1" in qp.qnames:
            w_q, s_w, bias = qp.qconv["dec0_conv1"]
            s_sk = qp.scales["enc0_conv2"]
            s_up = qp.scales["up0"]
            s_out = qp.scales["dec0_conv1"]
            a_sk, beta = fold(s_sk, s_w, bias, s_out)
            a_up, _ = fold(s_up, s_w, bias, s_out)
            P["dec0_conv1"] = ("int8", pack_i8(w_q[:, :, :w0]),
                               pack_i8(w_q[:, :, w0:]), a_sk, a_up, beta,
                               s_out, s_sk, s_up)
        else:
            k, b = qp.fconv["dec0_conv1"]
            ksk, bb = packed_f(np.asarray(k, np.float32)[:, :, :w0], b)
            kup, _ = packed_f(np.asarray(k, np.float32)[:, :, w0:],
                              np.zeros_like(np.asarray(b)))
            P["dec0_conv1"] = ("bf16", ksk, kup, bb)

        # head: raw [1, 1, C, O] kernel + [O] bias — _phase_dec0 runs it as
        # the per-phase matmul (ops/phase.phase_head_matmul, the same form
        # the training model's packed head uses); the dense block-diagonal
        # phase_head_kernel conv spends 4x the MACs for identical output.
        P["head"] = qp.fconv["head"]
        return P

    def _phase_dec0(self, v, s, skip, cut):
        """Packed-domain dec0: up0 as one matmul (output already packed),
        concat as two split-kernel convs (each source at its own scale),
        packed dec0 convs + head, depth-to-space only on the logits."""
        from tpu_unet.ops.phase import (conv2x2_valid, depth_to_space,
                                        phase_crop, phase_head_matmul)

        qp = self.qp
        P = self._phase
        km, bm = P["up0"]
        vin = self._deq(v, s).astype(jnp.bfloat16)
        u = jax.lax.dot_general(
            vin, km, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        u = (u + bm).astype(jnp.bfloat16)      # packed [.., 4*w0], signed
        if cut("up0", u):
            return u
        sk_p, sk_s = skip
        # full-res margin = packed-size difference; phase_crop enforces the
        # even-parity invariant
        skc = phase_crop(sk_p, sk_p.shape[1] - u.shape[1])

        spec = P["dec0_conv1"]
        if spec[0] == "int8":
            (_, wsk, wup, a_sk, a_up, beta, s_out, s_sk, s_up) = spec
            sk_q = skc if sk_s is not None else quantize_activations(skc, s_sk)
            u_q = quantize_activations(u, s_up)
            acc = (conv2x2_valid(sk_q, wsk, jnp.int32).astype(jnp.float32)
                   * a_sk
                   + conv2x2_valid(u_q, wup, jnp.int32).astype(jnp.float32)
                   * a_up)
            y = jnp.maximum(acc + beta, 0.0)
            v = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.int8)
            s = s_out
        else:
            _, ksk, kup, bb = spec
            skb = self._deq(skc, sk_s).astype(jnp.bfloat16)
            acc = (conv2x2_valid(skb, ksk, jnp.float32)
                   + conv2x2_valid(u, kup, jnp.float32))
            v = jnp.maximum(acc + bb, 0.0).astype(jnp.bfloat16)
            s = None
        if cut("dec0_conv1", v):               # packed
            return v

        spec = P["dec0_conv2"]
        if spec[0] == "int8":
            _, wp, alpha, beta, s_out = spec
            if s is None:
                v = quantize_activations(v, qp.scales["dec0_conv1"])
            v = conv3x3_int8_xla(v, wp, alpha, beta, out_kind="int8")
            s = s_out
        else:
            _, kp, bp = spec
            vb = self._deq(v, s).astype(jnp.bfloat16)
            y = conv2x2_valid(vb, kp, jnp.float32)
            v = jnp.maximum(y + bp, 0.0).astype(jnp.bfloat16)
            s = None
        if cut("dec0_conv2", v):               # packed
            return v

        kh, bh = P["head"]
        vb = self._deq(v, s).astype(jnp.bfloat16)
        y = phase_head_matmul(vb, kh, bh)
        return depth_to_space(y)

    def _conv_f(self, name: str, v: jax.Array, paired: bool = False) -> jax.Array:
        k, b = self.qp.fconv[name]
        k = k.astype(jnp.bfloat16)   # level-0 entries are stored f32
        if paired:
            k = self._blockdiag(k)
            b = jnp.concatenate([b, b])
        dn = jax.lax.conv_dimension_numbers(v.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), k, (1, 1), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)

    def _conv(self, name: str, v, s_in, paired: bool = False):
        """One 3x3 conv + ReLU. (v, s_in) -> (v, s_out); s None = float,
        float = int8 scale, ('u4s', s4) = shifted-u4 (int4 chain encoding).
        `paired`: v carries two batch images channel-concatenated; the kernel
        is lifted to its block-diagonal form."""
        qp = self.qp
        if name in qp.q4names:
            # w4a4: ~2x the int8 MXU rate (results/r3/int4_probe2.txt).
            # Inputs are post-ReLU here (decoder conv1s take the split-
            # kernel path in apply()), so the shifted-u4 encoding applies.
            w_q, s_w, bias = qp.q4conv[name]
            if isinstance(s_in, tuple):      # chained u4s: already encoded
                s_in4 = s_in[1]
            elif s_in is None:               # float input
                s_in4 = qp.scales[self._input_scale_key(name)] * _U4
                v = quantize_activations_u4s(v, s_in4)
            else:                            # int8 input at scale s_in
                s_in4 = s_in * _U4
                v = requantize_i8_to_u4s(v, s_in, s_in4)
            s_out4 = qp.scales[name] * _U4
            alpha = (s_in4 * s_w / s_out4).astype(jnp.float32)
            beta = (bias / s_out4).astype(jnp.float32)
            y = conv3x3_int4_xla(v, w_q, alpha, beta, out_kind="u4s",
                                 shifted=True)
            return y, ("u4s", s_out4)
        if name not in qp.qnames:
            return self._conv_f(name, self._deq(v, s_in), paired=paired), None
        if isinstance(s_in, tuple):
            # u4s feeding an int8 conv: requantize to the tensor's
            # calibrated int8 scale (round(u*s4/s8), the exact requantize
            # of the dequantized value)
            s4 = s_in[1]
            s_in = qp.scales[self._input_scale_key(name)]
            v = requantize_u4s_to_i8(v, s4, s_in)
        elif s_in is None:
            s_in = qp.scales[self._input_scale_key(name)]
            v = quantize_activations(v, s_in)
        w_q, s_w, bias = qp.qconv[name]
        s_out = qp.scales[name]
        alpha = (s_in * s_w / s_out).astype(jnp.float32)
        beta = (bias / s_out).astype(jnp.float32)
        if paired:
            w_q = self._blockdiag(w_q)
            alpha = jnp.concatenate([alpha, alpha])
            beta = jnp.concatenate([beta, beta])
        if self.layer_impl.get(name, self.impl) == "xla":
            return conv3x3_int8_xla(v, w_q, alpha, beta, out_kind="int8"), s_out
        y = conv3x3_fused(v, w_q, alpha, beta, out_kind="int8",
                          block_rows=self.block_rows,
                          variant="auto" if self.block_rows is None else "nconcat",
                          interpret=self._interp())
        return y, s_out

    def _conv_i4_split(self, d: int, u: jax.Array, skip):
        """Decoder conv1 in int4 WITHOUT materializing the concat: the
        kernel splits by source along cin ([skip | up], the production
        concat order) and the two int32 accumulators sum — the
        full-resolution concat tensor never exists (it is the biggest
        single HBM write/read of the int8 decoder), and each source keeps
        its own 4-bit scale instead of the int8 path's shared concat scale
        (better 16-level utilization). Skip side is post-ReLU -> shifted-u4;
        up side is a signed pre-ReLU upconv output -> signed s4."""
        qp = self.qp
        name = f"dec{d}_conv1"
        w_q, s_w, bias = qp.q4conv[name]
        c_skip = qp.cfg.widths[d]
        sk, sk_s = skip
        if isinstance(sk_s, tuple):
            s_sk4 = sk_s[1]
        elif sk_s is None:
            s_sk4 = qp.scales[f"enc{d}_conv2"] * _U4
            sk = quantize_activations_u4s(sk, s_sk4)
        else:
            s_sk4 = sk_s * _U4
            sk = requantize_i8_to_u4s(sk, sk_s, s_sk4)
        # sk is shifted-u4 here: a real zero activation is STORED as -8
        # (u4s keeps u in [0,15] as u-8), so the parity variant's pad-up
        # must fill -8 — a 0 fill would decode to 8*s_sk4 and
        # conv3x3_int4_acc's +8*sum(w) shift correction would inject that
        # phantom activation across the whole padded region.
        sk = center_crop_or_pad(sk, u.shape[1:3], fill=-8)
        s_up4 = qp.scales[f"up{d}"] * _S4
        u_q = quantize_activations_s4(u, s_up4)
        acc_sk = conv3x3_int4_acc(sk, w_q[:, :, :c_skip], shifted=True)
        acc_up = conv3x3_int4_acc(u_q, w_q[:, :, c_skip:], shifted=False)
        t = (acc_sk.astype(jnp.float32) * jnp.float32(s_sk4)
             + acc_up.astype(jnp.float32) * jnp.float32(s_up4))
        s_out4 = qp.scales[name] * _U4
        y = int4_epilogue(t, (s_w / s_out4).astype(jnp.float32),
                          (bias / s_out4).astype(jnp.float32),
                          out_kind="u4s")
        return y, ("u4s", s_out4)

    def _input_scale_key(self, name: str) -> str:
        """Calibration key for a quantized conv's float input tensor (= the
        producing tensor: pooling preserves scale)."""
        if name == "enc0_conv1":
            return "input"
        if name.startswith("dec") and name.endswith("_conv1"):
            return name + ":cat"
        if name.endswith("_conv2"):
            return name[:-1] + "1"
        if name == "bottleneck_conv1":
            return f"enc{self.qp.cfg.depth - 1}_conv2"
        d = int(name[3])           # enc{d}_conv1, d > 0
        return f"enc{d - 1}_conv2"

    # -- forward ------------------------------------------------------------

    def apply(self, x: jax.Array, stop_after: Optional[str] = None) -> jax.Array:
        """x [B, H, W, 1] f32 (normalized) -> f32 logits, UNet geometry.

        `stop_after`: return the intermediate tensor right after the named
        stage ('enc{d}_conv{i}', 'pool{d}', 'bottleneck_conv{i}', 'up{d}',
        'dec{d}_conv{i}') — cumulative-cutoff stage profiling on backends
        where only wall-clock-to-readback can be timed
        (scripts/tpu_stage_profile.py)."""
        cfg = self.qp.cfg
        qp = self.qp

        def maxpool(t):
            return jax.lax.reduce_window(
                t, _min_value(t.dtype), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        def cut(name, t):
            return stop_after is not None and name == stop_after

        def capture_skip(d, v, s):
            """Float skips feeding a quantized dec conv are stored int8 at
            the concat scale right away: the quantize sits next to its
            producer (fusable), the held tensor is half the bytes, and the
            dec-side requant becomes an identity (same scale).
            quantize(crop(x)) == crop(quantize(x)) — elementwise."""
            key = f"dec{d}_conv1:cat"
            if s is None and f"dec{d}_conv1" in qp.qnames and key in qp.scales:
                s_cat = qp.scales[key]
                return quantize_activations(v, s_cat), s_cat
            if (s is None and f"dec{d}_conv1" in qp.q4names
                    and f"enc{d}_conv2" in qp.scales):
                # float skip feeding an int4 decoder conv: capture u4s at
                # the source scale (same value _conv_i4_split would
                # compute; held tensor quantized next to its producer)
                s4 = qp.scales[f"enc{d}_conv2"] * _U4
                return quantize_activations_u4s(v, s4), ("u4s", s4)
            return v, s

        v, s = x.astype(jnp.bfloat16), None
        skips = []
        for d in range(cfg.depth):
            if d == 0 and self._phase is not None:
                from tpu_unet.ops.phase import (conv2x2_valid, phase_pool,
                                                space_to_depth)

                P = self._phase
                p = space_to_depth(v)          # [B, H/2, W/2, 4]
                k1p, b1p = P["enc0_conv1"]
                y = conv2x2_valid(p, k1p, jnp.float32)
                y = jnp.maximum(y + b1p, 0.0).astype(jnp.bfloat16)
                if cut("enc0_conv1", y):       # NOTE: packed [.., 4*w0]
                    return y
                spec = P["enc0_conv2"]
                if spec[0] == "int8":
                    _, wp, alpha, beta, s_out = spec
                    vq = quantize_activations(y, qp.scales["enc0_conv1"])
                    v = conv3x3_int8_xla(vq, wp, alpha, beta, out_kind="int8")
                    s = s_out
                else:
                    _, kp, bp = spec
                    v = conv2x2_valid(y, kp, jnp.float32)
                    v = jnp.maximum(v + bp, 0.0).astype(jnp.bfloat16)
                    s = None
                if cut("enc0_conv2", v):       # packed
                    return v
                skips.append((v, s))           # packed skip, own scale
                v = phase_pool(v)              # exits the packed domain
                if cut("pool0", v):
                    return v
                continue
            v, s = self._conv(f"enc{d}_conv1", v, s)
            if cut(f"enc{d}_conv1", v):
                return v
            v, s = self._conv(f"enc{d}_conv2", v, s)
            if cut(f"enc{d}_conv2", v):
                return v
            if cfg.skip_variant == "paper":
                skips.append(capture_skip(d, v, s))
            # max-pool is order-preserving: valid on int8 at the same scale
            v = maxpool(v)
            if cfg.skip_variant == "parity":
                skips.append(capture_skip(d, v, s))
            if cut(f"pool{d}", v):
                return v
        v, s = self._conv("bottleneck_conv1", v, s)
        if cut("bottleneck_conv1", v):
            return v
        v, s = self._conv("bottleneck_conv2", v, s)
        if cut("bottleneck_conv2", v):
            return v

        for d in reversed(range(cfg.depth)):
            if d == 0 and self._phase is not None:
                return self._phase_dec0(v, s, skips[0], cut)
            k, b = qp.fconv[f"up{d}"]
            vin = self._deq(v, s)
            if self.upconv_impl == "matmul":
                from tpu_unet.models.unet import matmul_upconv

                u = matmul_upconv(vin, k, b, dtype=jnp.bfloat16)
            else:
                u = jax.lax.conv_transpose(
                    vin, k, (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                u = (u + b).astype(jnp.bfloat16)
            if cut(f"up{d}", u):
                return u
            sk, sk_s = skips[d]
            name = f"dec{d}_conv1"
            if name in qp.q4names:
                v, s = self._conv_i4_split(d, u, skips[d])
            elif name in qp.qnames:
                # concat in int8: rescale the int8 skip directly
                # (round(q*sk_s/s_cat) == requantize of the dequantized value,
                # exactly) and quantize the bf16 upconv output — the bf16
                # concat tensor is never materialized (half the HBM traffic
                # of dequant->concat->quantize at full resolution).
                s_cat = qp.scales[name + ":cat"]
                if sk_s is None:
                    sk_q = quantize_activations(sk, s_cat)
                elif isinstance(sk_s, tuple):  # u4s skip from an int4 enc
                    sk_q = requantize_u4s_to_i8(sk, sk_s[1], s_cat)
                elif sk_s == s_cat:
                    sk_q = sk          # captured at the concat scale already
                else:
                    ratio = jnp.float32(sk_s / s_cat)
                    sk_q = jnp.clip(
                        jnp.round(sk.astype(jnp.float32) * ratio),
                        -127.0, 127.0).astype(jnp.int8)
                sk_q = center_crop_or_pad(sk_q, u.shape[1:3])
                cat = jnp.concatenate(
                    [sk_q, quantize_activations(u, s_cat)], axis=-1)
                v, s = self._conv(name, cat, s_cat)
            else:
                sk = center_crop_or_pad(self._deq(sk, sk_s), u.shape[1:3])
                cat = jnp.concatenate([sk, u], axis=-1)
                v, s = self._conv(name, cat, None)
            if cut(name, v):
                return v
            v, s = self._conv(f"dec{d}_conv2", v, s)
            if cut(f"dec{d}_conv2", v):
                return v

        v = self._deq(v, s)
        k, b = qp.fconv["head"]
        y = jax.lax.conv_general_dilated(
            v, k, (1, 1), "VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                v.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.float32)
        return y + b


def _min_value(dtype):
    if dtype == jnp.int8:
        return jnp.int8(-128)
    return jnp.asarray(-jnp.inf, dtype)


def calibration_batch(images, size: int = 188, n: int = 2) -> jax.Array:
    """Normalized [n, size, size, 1] f32 center crops of eval images for
    `calibrate` — activation scales are per-tensor scalars, so a small valid
    input size keeps calibration cheap while sampling real data statistics."""
    out = []
    for img in list(images)[:max(n, 1)]:
        a = np.asarray(img, np.float32)
        # Normalize the FULL image first, then crop — serving (TileInference
        # normalize=True) normalizes whole images before tiling, so a crop
        # normalized by its own local min/ptp would misestimate activation
        # scales whenever the crop's dynamic range differs from the image's.
        a = (a - a.min()) / max(np.ptp(a), 1e-12)
        h, w = a.shape
        if h < size or w < size:
            a = np.pad(a, ((0, max(0, size - h)), (0, max(0, size - w))),
                       mode="reflect")
            h, w = a.shape
        y0, x0 = (h - size) // 2, (w - size) // 2
        out.append(a[y0:y0 + size, x0:x0 + size])
    return jnp.asarray(np.stack(out)[..., None])


def add_concat_scales(cfg: ModelConfig, scales: Dict[str, float]) -> Dict[str, float]:
    """Derive each decoder concat tensor's scale from its two sources:
    max(skip post-ReLU scale, |upconv| scale). Skip source: enc{d}_conv2."""
    out = dict(scales)
    for d in range(cfg.depth):
        if f"enc{d}_conv2" in scales and f"up{d}" in scales:
            out[f"dec{d}_conv1:cat"] = max(scales[f"enc{d}_conv2"],
                                           scales[f"up{d}"])
    return out


def save_quant_params(path: str, qp: QuantParams) -> None:
    """Serialize a calibrated QuantParams to one .npz (int8 kernels, scale
    vectors, bf16 float tensors, per-tensor scales, model config) — prepare
    once, serve anywhere without re-calibration."""
    import json

    arrays = {}
    for name, (w_q, s_w, bias) in qp.qconv.items():
        arrays[f"q:{name}:w"] = np.asarray(w_q)
        arrays[f"q:{name}:s"] = np.asarray(s_w)
        arrays[f"q:{name}:b"] = np.asarray(bias)
    for name, (w_q, s_w, bias) in qp.q4conv.items():
        arrays[f"q4:{name}:w"] = np.asarray(w_q)
        arrays[f"q4:{name}:s"] = np.asarray(s_w)
        arrays[f"q4:{name}:b"] = np.asarray(bias)
    for name, (k, b) in qp.fconv.items():
        # npz has no bf16: store f32, restore to the prepare-time dtype
        # (bf16 round-trips exactly through f32; the level-0 kernels are
        # f32 in fconv and stay f32 — see _LEVEL0_CONVS)
        arrays[f"f:{name}:k"] = np.asarray(k, dtype=np.float32)
        arrays[f"f:{name}:b"] = np.asarray(b)
    meta = {
        "cfg": dataclasses.asdict(qp.cfg),
        "qnames": sorted(qp.qnames),
        "q4names": sorted(qp.q4names),
        "scales": qp.scales,
    }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if not path.endswith(".npz"):
        path += ".npz"         # np.savez appends it anyway; keep load symmetric
    np.savez(path, **arrays)


def load_quant_params(path: str) -> QuantParams:
    """Inverse of `save_quant_params`."""
    import json

    if not path.endswith(".npz") and not os.path.exists(path):
        path += ".npz"
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        cfg = ModelConfig(**meta["cfg"])
        qconv, fconv, q4conv = {}, {}, {}
        for key in z.files:
            kind, _, rest = key.partition(":")
            if kind == "q" and rest.endswith(":w"):
                name = rest[:-2]
                qconv[name] = (jnp.asarray(z[f"q:{name}:w"]),
                               jnp.asarray(z[f"q:{name}:s"]),
                               jnp.asarray(z[f"q:{name}:b"]))
            elif kind == "q4" and rest.endswith(":w"):
                name = rest[:-2]
                q4conv[name] = (jnp.asarray(z[f"q4:{name}:w"]),
                                jnp.asarray(z[f"q4:{name}:s"]),
                                jnp.asarray(z[f"q4:{name}:b"]))
            elif kind == "f" and rest.endswith(":k"):
                name = rest[:-2]
                dt = (jnp.float32 if name in _LEVEL0_CONVS
                      else jnp.bfloat16)
                fconv[name] = (jnp.asarray(z[f"f:{name}:k"], dt),
                               jnp.asarray(z[f"f:{name}:b"]))
    return QuantParams(cfg=cfg, qnames=frozenset(meta["qnames"]),
                       scales=dict(meta["scales"]), qconv=qconv, fconv=fconv,
                       q4names=frozenset(meta.get("q4names", ())),
                       q4conv=q4conv)


def build_quant_inference(model, params, sample_batch,
                          min_channels: int = 128, impl: str = "xla",
                          block_rows: Optional[int] = None,
                          interpret: Optional[bool] = None,
                          layer_impl: Optional[Dict[str, str]] = None,
                          phase_level0: Optional[str] = None,
                          int4: bool = False,
                          int4_names: Optional[FrozenSet[str]] = None,
                          ) -> QuantInference:
    """Calibrate + quantize + build in one step. `int4=True` runs the
    default int4 set (every cin>=128 conv outside level 0) w4a4 — ~2x the
    int8 MXU rate (results/r3/int4_probe2.txt); `int4_names` overrides the
    set explicitly."""
    cfg = model.cfg
    scales = add_concat_scales(cfg, calibrate(model, params, sample_batch))
    qnames = default_quant_names(cfg, min_channels)
    if int4_names is None and int4:
        int4_names = default_int4_names(cfg, min_channels)
    qp = prepare_quant_params(cfg, params, scales, qnames, q4names=int4_names)
    return QuantInference(qp, impl=impl, block_rows=block_rows,
                          interpret=interpret, layer_impl=layer_impl,
                          phase_level0=phase_level0)
