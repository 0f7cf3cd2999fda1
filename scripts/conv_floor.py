"""Microbenchmark: are PIDNet's convolutions at their standalone envelope?

The round-3 per-op profile attributes ~23 ms of the 38 ms training step
to conv fusions (fwd+bwd) vs ~2 ms of MXU-ideal math. Two hypotheses:
(a) XLA's conv lowering is slow for these shapes even standalone (a
custom conv could win), or (b) each conv is near its standalone envelope
and the in-graph cost is layout/fusion overhead. This times the hottest
conv shapes of PIDNet-S @1024² batch-8 standalone and prints achieved
vs MXU-ideal and HBM-bandwidth-ideal times.

Measurement notes (axon tunnel): per-call host sync costs ~36-40 ms of
round-trip latency and `jax.block_until_ready` can return early, so each
timing is a CHAINED `fori_loop` of the op inside one jit (data-dependent
iterations), synced by a scalar pull, reported as the (long run − short
run) differential. Total device time per timing ≥ ~200 ms so pull-latency
variance (~ms) is noise. Calibration on this setup: chained 8192³ bf16
matmul = 176.5 TFLOP/s (90% of v5e's 197 peak), int8 340.7 TOP/s.

Run on the TPU with nothing else using the chip:
    python scripts/conv_floor.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, N, H, W, Cin, Cout, k, stride) — the load-bearing convs of
# PIDNet-S (planes=32) @1024x1024 batch 8: 1/4=256, 1/8=128, 1/16=64.
SHAPES = [
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


def bench_chain(step, x0, target_s=0.25, probe_iters=64):
    """Differential chained timing: jit fori_loop(n) of `step`, scalar-pull
    sync, (t(n_hi) - t(n_lo)) / (n_hi - n_lo)."""
    f = jax.jit(
        lambda x, n: jnp.sum(
            jax.lax.fori_loop(0, n, lambda i, a: step(a), x)
        )
    )
    float(f(x0, 2))  # compile + warm
    t0 = time.perf_counter()
    float(f(x0, 2 + probe_iters))
    probe = (time.perf_counter() - t0) / probe_iters
    n_hi = max(probe_iters, int(target_s / max(probe, 1e-7)))
    t0 = time.perf_counter()
    float(f(x0, 2))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(x0, 2 + n_hi))
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / n_hi


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")
    tot_fwd = tot_dx = tot_dw = 0.0
    for name, n, h, w, ci, co, k, s in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.01, jnp.bfloat16)
        wtT = jnp.asarray(
            rng.standard_normal((k, k, co, ci)) * 0.01, jnp.bfloat16
        )

        def conv(a, b, st=s):
            return jax.lax.conv_general_dilated(
                a, b, (st, st), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        oh, ow = h // s, w // s
        y0 = jnp.asarray(rng.standard_normal((n, oh, ow, co)), jnp.bfloat16)

        # chain must be shape-stable, so time the fwd+dx PAIR: conv down,
        # transposed conv (the dL/dx form) back up
        def pair(a):
            y = conv(a, wt)
            dx = jax.lax.conv_general_dilated(
                y, wtT, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                lhs_dilation=(s, s),
            )
            return dx.astype(jnp.bfloat16)

        t_pair = bench_chain(pair, x)

        # dw: grad w.r.t. weights, chained by feeding dw back as weights
        def dw_step(b):
            _, vjp = jax.vjp(lambda bb: conv(x, bb), b)
            return (b + 1e-6 * vjp(y0)[0]).astype(jnp.bfloat16)

        t_dw = bench_chain(dw_step, wt)

        flops = 2 * n * oh * ow * ci * co * k * k
        bytes_ = 2 * (n * h * w * ci + k * k * ci * co + n * oh * ow * co)
        ideal = max(flops / PEAK_TFLOPS, bytes_ / PEAK_GBS)
        tot_fwd += t_pair
        tot_dw += t_dw
        print(
            f"{name:28s} fwd+dx {t_pair*1e6:7.1f}us (2x floor {2*ideal*1e6:6.1f}us,"
            f" {2*ideal/t_pair*100:3.0f}%)  dw {t_dw*1e6:7.1f}us (floor {ideal*1e6:6.1f}us)"
        )
    print(f"totals: fwd+dx {tot_fwd*1e3:.2f} ms   dw {tot_dw*1e3:.2f} ms")


if __name__ == "__main__":
    main()
