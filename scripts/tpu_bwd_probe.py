"""Backward-pass cost attribution (round 3): the honest train profile puts
the param backward at ~30 ms vs a 9.4 ms forward (equal FLOPs). This times,
per conv layer of the 572-in HeLa config, XLA's three conv kernels — fwd,
dgrad (input grads), wgrad (weight grads) — at the layer's true shape, plus
an im2col-as-matmul wgrad reformulation candidate for the shallow layers.

Usage: python scripts/tpu_bwd_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_unet.utils.profiling import measure_roundtrip, timeit_readback

    log(f"device: {jax.devices()[0]}; establishing session ...")
    float(jnp.zeros(()).sum())
    log(f"roundtrip {measure_roundtrip()*1e3:.1f} ms")

    B = 2
    # (label, in_size, cin, cout) for each distinct conv of the 572-in
    # forward: encoder convs, bottleneck, decoder convs (post-concat cin).
    # exact 572-in geometry: enc0 572->570->568, pool 284; enc1 ->282->280,
    # pool 140; enc2 ->138->136, pool 68; enc3 ->66->64, pool 32; bott
    # ->30->28; dec3 up 56, convs ->54->52; dec2 104->102->100; dec1
    # 200->198->196; dec0 392->390->388.
    layers = [("enc0_c1", 572, 1, 64), ("enc0_c2", 570, 64, 64),
              ("enc1_c1", 284, 64, 128), ("enc1_c2", 282, 128, 128),
              ("enc2_c1", 140, 128, 256), ("enc2_c2", 138, 256, 256),
              ("enc3_c1", 68, 256, 512), ("enc3_c2", 66, 512, 512),
              ("bott_c1", 32, 512, 1024), ("bott_c2", 30, 1024, 1024),
              ("dec3_c1", 56, 1024, 512), ("dec3_c2", 54, 512, 512),
              ("dec2_c1", 104, 512, 256), ("dec2_c2", 102, 256, 256),
              ("dec1_c1", 200, 256, 128), ("dec1_c2", 198, 128, 128),
              ("dec0_c1", 392, 128, 64), ("dec0_c2", 390, 64, 64)]

    dn = lax.conv_dimension_numbers((B, 8, 8, 1), (3, 3, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def t(label, fn, *a):
        try:
            d = timeit_readback(fn, *a)
            log(f"  {label}: {d*1e3:6.2f} ms")
            return d
        except Exception as e:
            log(f"  {label}: FAIL {type(e).__name__}: {str(e)[:90]}")
            return None

    tot = {"fwd": 0.0, "dgrad": 0.0, "wgrad": 0.0, "wgrad_mm": 0.0,
           "dgrad_mm": 0.0}
    key = jax.random.PRNGKey(0)
    for name, s, cin, cout in layers:
        so = s - 2
        x = jax.random.normal(key, (B, s, s, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        gy = jax.random.normal(key, (B, so, so, cout), jnp.bfloat16)

        # plain bf16 conv (TPU accumulates f32 internally regardless); a
        # f32-accum + cast wrapper makes jax.vjp emit mixed-dtype convs
        def conv(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1), "VALID",
                dimension_numbers=lax.conv_dimension_numbers(
                    x_.shape, w_.shape, ("NHWC", "HWIO", "NHWC")))

        d1 = t(f"{name:9s} fwd   [{B},{s},{s},{cin}]->{cout}",
               jax.jit(conv), x, w)

        dgrad = jax.jit(lambda g_, x_, w_: jax.vjp(
            lambda xx: conv(xx, w_), x_)[1](g_)[0])
        d2 = t(f"{name:9s} dgrad", dgrad, gy, x, w)
        wgrad = jax.jit(lambda g_, x_, w_: jax.vjp(
            lambda ww: conv(x_, ww), w_)[1](g_)[0])
        d3 = t(f"{name:9s} wgrad", wgrad, gy, x, w)

        # candidates (ops/conv_bwd.py): wgrad as ONE tall-skinny im2col
        # matmul and dgrad as the flipped-kernel full correlation matmul
        from tpu_unet.ops.conv_bwd import dgrad_mm, wgrad_mm

        d4 = t(f"{name:9s} wgrad-mm", jax.jit(wgrad_mm), gy, x)
        d5 = t(f"{name:9s} dgrad-mm", jax.jit(dgrad_mm), gy, w)
        for k, d in (("fwd", d1), ("dgrad", d2), ("wgrad", d3),
                     ("wgrad_mm", d4), ("dgrad_mm", d5)):
            if d:
                tot[k] += d
    log(f"totals: fwd {tot['fwd']*1e3:.1f} ms, dgrad {tot['dgrad']*1e3:.1f}, "
        f"wgrad {tot['wgrad']*1e3:.1f}, wgrad-mm {tot['wgrad_mm']*1e3:.1f}, "
        f"dgrad-mm {tot['dgrad_mm']*1e3:.1f}")


if __name__ == "__main__":
    main()
