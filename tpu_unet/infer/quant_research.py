"""Measured-negative serving formulations, quarantined (VERDICT r3 item 5).

Two round-2/3 research formulations of the int8 serving forward were built,
exactness-tested, and measured END-TO-END SLOWER on hardware than the
production path; they are preserved here — runnable and tested — so the
production ``QuantInference.apply`` (infer/quant.py) stays readable as
(phase | plain) x (int8 | int4) with zero default-off branches:

* ``pair_level0`` — level-0 batch pairing: XLA pads <128-channel convs to the
  128-lane tile (a 64->64 conv measures exactly the 128->128 cost,
  results/r2/shootout.txt), so level 0 folds TWO batch images into the
  channel dim with block-diagonal kernels — half the padded conv FLOPs.
  Measured e2e slower as integrated (304 vs 351 tiles/s,
  results/r2/bench_run2.json): the pair/unpair channel interleaves cost more
  than the conv savings at serving shapes.
* ``fused_enc0`` / ``fused_concat`` — the fused level-0 Pallas chains
  (ops/fused_level0.py, VERDICT r2 item 2): enc0 conv1+conv2+pool0 (+ the
  paper-skip capture quantization) as ONE Pallas pass, and each quantized
  decoder concat + requantize as one VPU pass. Exactness-tested
  (tests/test_fused_level0.py, tests/test_quant.py); measured 3.5x slower
  than the XLA composition at serving shapes
  (results/r3/fused_level0_shootout4.txt).

The phase-packed formulation (``phase_level0``) superseded both as the
production level-0 formulation (+12.8% serving, results/r3/bench_phase_ab).

``apply`` here intentionally preserves the full interleaved branching exactly
as it was measured in rounds 2-3 (the production class's apply is the same
code with these branches deleted); the equality tests in tests/test_quant.py
pin both against each other so they cannot silently drift.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tpu_unet.infer.quant import QuantInference, QuantParams, _min_value
from tpu_unet.models import center_crop_or_pad
from tpu_unet.ops.conv_tiles import quantize_activations, requantize_u4s_to_i8


class ResearchQuantInference(QuantInference):
    """QuantInference + the measured-negative level-0 formulations.

    Accepts every production argument, plus:
      pair_level0      — fold batch pairs into channels at level 0
      fused_enc0       — run enc0 conv1+conv2+pool0 as one Pallas chain
      fused_concat     — run quantized decoder concats as one VPU pass
      fused_enc0_opts  — kernel tuning knobs for enc0_chain (block_rows/
                         block_cols/pool_mode), set from the hardware
                         shootout's winner
    """

    def __init__(self, qp: QuantParams, *,
                 pair_level0: bool = False,
                 fused_enc0: bool = False,
                 fused_concat: bool = False,
                 fused_enc0_opts: Optional[Dict[str, object]] = None,
                 **kwargs):
        super().__init__(qp, **kwargs)
        if self.phase_level0 and (pair_level0 or fused_enc0 or fused_concat):
            raise ValueError("phase_level0 is a level-0 formulation of its "
                             "own; combine it with none of pair_level0/"
                             "fused_enc0/fused_concat")
        if qp.q4names and (pair_level0 or fused_enc0 or fused_concat):
            raise ValueError("the int4 serving path composes with the "
                             "production formulations (phase_level0, plain "
                             "int8) only; not with pair_level0/fused_enc0/"
                             "fused_concat")
        self.pair_level0 = pair_level0
        self.fused_enc0 = fused_enc0
        self.fused_concat = fused_concat
        self.fused_enc0_opts = dict(fused_enc0_opts or {})

    # -- forward (round-2/3 form: all formulations interleaved) --------------

    def apply(self, x: jax.Array, stop_after: Optional[str] = None) -> jax.Array:
        """x [B, H, W, 1] f32 (normalized) -> f32 logits; same contract as
        the production apply, plus the quarantined formulation branches."""
        if not (self.pair_level0 or self.fused_enc0 or self.fused_concat):
            # no research formulation requested: the production forward is
            # the exact same math (and handles phase/int4, which the
            # constructor rejects in combination with the research flags)
            return super().apply(x, stop_after=stop_after)
        cfg = self.qp.cfg
        qp = self.qp
        bsz = x.shape[0]
        pair0 = (self.pair_level0 and bsz % 2 == 0 and bsz > 1
                 and "enc0_conv1" not in qp.qnames
                 and "enc0_conv2" not in qp.qnames)

        # Pair/unpair via the Pallas copy kernels (ops/interleave.py): XLA's
        # channel-slice/batch-concat emitters measured 4-10x off bandwidth
        # at these shapes (results/r2/shootout_pair0c.txt). The 1-channel
        # input and 2-channel logits stay on jnp.concatenate (tiny tensors,
        # lane-width-1 Pallas blocks would be worse).
        from tpu_unet.ops.interleave import (
            interleave_pairs, pair_batch_channels, unpair_batch_channels)

        interp = self._interp()

        def pair(t):     # [B, H, W, C] -> [B/2, H, W, 2C]: image i with i+B/2
            if t.shape[-1] < 8:
                return jnp.concatenate([t[:bsz // 2], t[bsz // 2:]], axis=-1)
            return pair_batch_channels(t, interpret=interp)

        def unpair(t):
            c = t.shape[-1] // 2
            if c < 8:
                return jnp.concatenate([t[..., :c], t[..., c:]], axis=0)
            return unpair_batch_channels(t, interpret=interp)

        def maxpool(t):
            return jax.lax.reduce_window(
                t, _min_value(t.dtype), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        def cut(name, t):
            return stop_after is not None and name == stop_after

        def capture_skip(d, v, s):
            key = f"dec{d}_conv1:cat"
            if s is None and f"dec{d}_conv1" in qp.qnames and key in qp.scales:
                s_cat = qp.scales[key]
                return quantize_activations(v, s_cat), s_cat
            return v, s

        v, s = x.astype(jnp.bfloat16), None
        skips = []
        paired_skip = None
        fused_enc0 = (self.fused_enc0 and stop_after is None and not pair0
                      and cfg.skip_variant == "paper"
                      and cfg.in_channels == 1
                      and "enc0_conv1" not in qp.qnames
                      and "enc0_conv2" not in qp.qnames)
        for d in range(cfg.depth):
            if d == 0 and fused_enc0:
                from tpu_unet.ops.fused_level0 import enc0_chain

                k1, b1 = qp.fconv["enc0_conv1"]
                k2, b2 = qp.fconv["enc0_conv2"]
                key = "dec0_conv1:cat"
                s_skip = (qp.scales[key] if "dec0_conv1" in qp.qnames
                          and key in qp.scales else 0.0)
                skip, v = enc0_chain(v, k1.astype(jnp.bfloat16), b1,
                                     k2.astype(jnp.bfloat16), b2,
                                     skip_scale=s_skip, interpret=interp,
                                     **self.fused_enc0_opts)
                skips.append((skip, s_skip if s_skip else None))
                s = None
                continue
            if d == 0 and pair0:
                vp = pair(v)
                vp = self._conv_f("enc0_conv1", vp, paired=True)
                if cut("enc0_conv1", vp):
                    return vp
                vp = self._conv_f("enc0_conv2", vp, paired=True)
                if cut("enc0_conv2", vp):
                    return vp
                if cfg.skip_variant == "paper":
                    paired_skip = vp
                vp = maxpool(vp)
                if cfg.skip_variant == "parity":
                    paired_skip = vp
                skips.append((None, None))  # dec0 reads paired_skip instead
                v, s = unpair(vp), None
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
            if d == 0 and paired_skip is not None:
                # Paired tail: pair the upconv output (cheap batch-half
                # channel concat), interleave with the paired skip to the
                # per-image [skip | up] layout, and run dec0 + head with
                # block-diagonal kernels; unpair only the tiny logits.
                skp = center_crop_or_pad(paired_skip, u.shape[1:3])
                if name in qp.qnames:
                    # quantize BEFORE interleaving: the big concat then
                    # moves int8, half the bytes of a bf16 concat + quantize
                    s_cat = qp.scales[name + ":cat"]
                    cat_p = interleave_pairs(
                        quantize_activations(skp, s_cat),
                        pair(quantize_activations(u, s_cat)),
                        interpret=interp)
                    v, s = self._conv(name, cat_p, s_cat, paired=True)
                else:
                    cat_p = interleave_pairs(skp, pair(u), interpret=interp)
                    v, s = self._conv(name, cat_p, None, paired=True)
                if cut("dec0_conv1", v):
                    return v
                v, s = self._conv("dec0_conv2", v, s, paired=True)
                if cut("dec0_conv2", v):
                    return v
                v = self._deq(v, s)
                k, b = qp.fconv["head"]
                y = jax.lax.conv_general_dilated(
                    v, self._blockdiag(k), (1, 1), "VALID",
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        v.shape, self._blockdiag(k).shape,
                        ("NHWC", "HWIO", "NHWC")),
                    preferred_element_type=jnp.float32)
                return unpair(y + jnp.concatenate([b, b]))
            if name in qp.qnames:
                # concat in int8 (see the production apply for the math)
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
                if self.fused_concat:
                    from tpu_unet.ops.fused_level0 import concat_quantize

                    cat = concat_quantize(sk_q, u, s_cat, interpret=interp)
                else:
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
