"""Microbenchmark: are PIDNet's convolutions at their standalone envelope?

The round-3 per-op profile attributes ~23 ms of the 38 ms training step
to conv fusions (fwd+bwd) vs ~2 ms of MXU-ideal math — ~10% MXU
utilization. Two hypotheses: (a) XLA's conv lowering is slow for these
shapes even standalone (a Pallas conv could win), or (b) each conv is
near its standalone envelope and the in-graph cost is layout/fusion
overhead (not addressable from JAX). This script times the hottest
conv shapes of PIDNet-S @1024² batch-8 standalone — fwd, and the two
backward forms (dL/dx as transposed conv, dL/dw as a contraction) — and
prints achieved vs MXU-ideal and vs HBM-bandwidth-ideal times.

Run on the TPU with nothing else using the chip:
    python scripts/conv_floor.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# (N, H, W, Cin, Cout, k, stride) — the load-bearing convs of PIDNet-S
# @1024x1024 batch 8 (see models/pidnet.py; I/P/D branch stages at 1/8,
# backbone at 1/8..1/32, s2d stem).
SHAPES = [
    # PIDNet-S planes=32 @1024^2 batch 8: 1/4=256, 1/8=128, 1/16=64, 1/32=32
    ("layer1-s2d2 3x3 C128 @128", 8, 128, 128, 128, 128, 3, 1),
    ("layer2 3x3 C64 @128", 8, 128, 128, 64, 64, 3, 1),
    ("layer3 3x3 C128 @64", 8, 64, 64, 128, 128, 3, 1),
    ("P branch 3x3 C64 @128", 8, 128, 128, 64, 64, 3, 1),
    ("D branch 3x3 C32->64 @128", 8, 128, 128, 32, 64, 3, 1),
    ("layer4 3x3 C256 @32", 8, 32, 32, 256, 256, 3, 1),
    ("layer5 3x3 C512 @16", 8, 16, 16, 512, 512, 3, 1),
    ("compression 1x1 128->64 @128", 8, 128, 128, 128, 64, 1, 1),
]

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_GBS = 819e9  # v5e HBM


def bench(f, *args, iters=50):
    f = jax.jit(f)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")
    tot_fwd = tot_dx = tot_dw = 0.0
    for name, n, h, w, ci, co, k, s in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, ci, co)), jnp.bfloat16)

        def conv(x, wt):
            return jax.lax.conv_general_dilated(
                x, wt, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        def dx(x, wt):
            y, vjp = jax.vjp(lambda a: conv(a, wt), x)
            return vjp(jnp.ones_like(y))[0]

        def dw(x, wt):
            y, vjp = jax.vjp(lambda b: conv(x, b), wt)
            return vjp(jnp.ones_like(y))[0]

        t_f = bench(conv, x, wt)
        t_dx = bench(dx, x, wt)
        t_dw = bench(dw, x, wt)
        oh, ow = h // s, w // s
        flops = 2 * n * oh * ow * ci * co * k * k
        bytes_ = 2 * (n * h * w * ci + k * k * ci * co + n * oh * ow * co)
        ideal_mxu = flops / PEAK_TFLOPS
        ideal_bw = bytes_ / PEAK_GBS
        floor = max(ideal_mxu, ideal_bw)
        tot_fwd += t_f
        tot_dx += t_dx
        tot_dw += t_dw
        print(
            f"{name:28s} fwd {t_f*1e6:7.1f}us (floor {floor*1e6:6.1f}, "
            f"{floor/t_f*100:4.0f}%)  dx {t_dx*1e6:7.1f}us  dw {t_dw*1e6:7.1f}us"
        )
    print(f"totals: fwd {tot_fwd*1e3:.2f} ms  dx {tot_dx*1e3:.2f} ms  dw {tot_dw*1e3:.2f} ms")


if __name__ == "__main__":
    main()
