"""A/B: hand Pallas conv3x3 (ops/conv3x3.py) vs XLA's conv lowering on
PIDNet's hot training shapes — the round-4 "prove the floor with a
kernel" experiment (VERDICT round 3, next #1).

Timing uses the chained-differential protocol from conv_floor.py (axon
host round-trip ~tens of ms, so each measurement is a long in-graph
chain synced by one scalar pull). Three comparisons per shape:

  plain    conv only
  fused    conv + bias + relu           (XLA fuses these into the conv)
  stats    conv + per-channel sum/sumsq (training BN statistics)

Run with nothing else on the chip:  python scripts/conv_ab.py
"""

import sys, time, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from pidnet_tpu.ops.conv3x3 import conv3x3

PEAK_TFLOPS = 197e12

# (name, N, H, W, C) — stride-1 3x3 C->C; the W-folded 1/8-res stages
# (C128 @128x128) dominate the P/D branches, layer4/5 carry C256/C512
SHAPES = [
    ("wfold-P/D 3x3 C128 @128", 8, 128, 128, 128),
    ("layer4 3x3 C256 @32", 8, 32, 32, 256),
    ("layer5 3x3 C512 @16", 8, 16, 16, 512),
]


def bench_chain(step, x0, target_s=0.25, probe_iters=64):
    f = jax.jit(
        lambda x, n: jnp.sum(
            jax.lax.fori_loop(0, n, lambda i, a: step(a), x)
        )
    )
    float(f(x0, 2))
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
    for name, n, h, w, c in SHAPES:
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        th = min(16, h)
        flops = 2 * n * h * w * 9 * c * c
        ideal_us = flops / PEAK_TFLOPS * 1e6

        def xla_conv(a):
            return jax.lax.conv_general_dilated(
                a, wt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        def xla_fused(a):
            return jnp.maximum(xla_conv(a) + b.astype(jnp.bfloat16), 0)

        def xla_stats(a):
            y = xla_conv(a)
            yf = y.astype(jnp.float32)
            s = jnp.sum(yf, axis=(0, 1, 2))
            s2 = jnp.sum(yf * yf, axis=(0, 1, 2))
            # fold the stats back so the chain stays shape-stable
            return (y + (s + s2).astype(y.dtype) * 1e-20).astype(jnp.bfloat16)

        def pl_conv(a):
            return conv3x3(a, wt, tile_h=th)

        def pl_fused(a):
            return conv3x3(a, wt, b, relu=True, tile_h=th)

        def pl_stats(a):
            y, st = conv3x3(a, wt, stats=True, tile_h=th)
            return (y + jnp.sum(st) * 1e-20).astype(jnp.bfloat16)

        print(f"\n{name}  (MXU-ideal {ideal_us:.1f} us)")
        for tag, fx, fp in (
            ("plain", xla_conv, pl_conv),
            ("fused", xla_fused, pl_fused),
            ("stats", xla_stats, pl_stats),
        ):
            tx = bench_chain(fx, x) * 1e6
            tp = bench_chain(fp, x) * 1e6
            print(
                f"  {tag:6s} xla {tx:7.1f} us ({ideal_us/tx*100:5.1f}% SoL)"
                f"   pallas {tp:7.1f} us ({ideal_us/tp*100:5.1f}% SoL)"
                f"   pallas/xla {tp/tx:5.2f}x"
            )


if __name__ == "__main__":
    main()
