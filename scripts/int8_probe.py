"""Go/no-go probe for an int8 PTQ inference path: time bf16 vs int8
convolutions standalone at PIDNet-S's inference-hot shapes (batch 1
@1024x2048 — the bench configuration). v5e's MXU does 394 int8 TOPS vs
197 bf16 TFLOPS, and int8 activations halve HBM traffic; if the
standalone convs don't show a solid win here, a quantized path cannot
pay for its quant/dequant overhead and is not worth building.

Uses the differential chained-timing method of conv_floor.py (axon
round-trip latency swamps per-call timing).

Run on the TPU with nothing else using the chip:
    python scripts/int8_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

from conv_floor import bench_chain  # noqa: E402

# (name, H, W, Cin, Cout, k) — inference (batch 1) @1024x2048: 1/2=512x1024,
# 1/4=256x512, 1/8=128x256, 1/16=64x128, 1/32=32x64
SHAPES = [
    ("stem conv2 3x3 C32 @1/2", 512, 1024, 32, 32, 3),
    ("layer1 3x3 C64(s2d) @1/4", 256, 256, 128, 128, 3),
    ("layer2/P 3x3 C64 @1/8", 128, 256, 64, 64, 3),
    ("P wfold 3x3 C128 @1/8", 128, 128, 128, 128, 3),
    ("layer3 3x3 C128 @1/16", 64, 128, 128, 128, 3),
    ("layer4 3x3 C256 @1/32", 32, 64, 256, 256, 3),
    ("layer5 3x3 C512 @1/64", 16, 32, 512, 512, 3),
]

DN = ("NHWC", "HWIO", "NHWC")


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for name, h, w, ci, co, k in SHAPES:
        x_bf = jnp.asarray(rng.standard_normal((1, h, w, ci)), jnp.bfloat16)
        k_bf = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.bfloat16)
        x_i8 = jnp.asarray(rng.integers(-127, 127, (1, h, w, ci)), jnp.int8)
        k_i8 = jnp.asarray(rng.integers(-127, 127, (k, k, ci, co)), jnp.int8)

        def step_bf(x, k_bf=k_bf, ci=ci, co=co):
            y = jax.lax.conv_general_dilated(
                x, k_bf, (1, 1), "SAME", dimension_numbers=DN
            )
            return y if ci == co else y[..., :ci]

        def step_i8(x, k_i8=k_i8, ci=ci, co=co):
            y = jax.lax.conv_general_dilated(
                x, k_i8, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            # requantize back to int8 (what a real int8 chain must do)
            y = (y >> 7).astype(jnp.int8)
            return y if ci == co else y[..., :ci]

        t_bf = bench_chain(step_bf, x_bf)
        t_i8 = bench_chain(step_i8, x_i8)
        macs = h * w * ci * co * k * k
        print(
            f"{name:28s} bf16 {t_bf*1e6:8.1f} us ({2*macs/t_bf/1e12:5.1f} TFLOP/s)"
            f"  int8 {t_i8*1e6:8.1f} us ({2*macs/t_i8/1e12:5.1f} TOP/s)"
            f"  speedup {t_bf/t_i8:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
