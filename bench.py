"""Driver benchmark: PIDNet-S Cityscapes-resolution inference FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference's published PIDNet-S 93.2 FPS @2048x1024 on an
RTX 3090 (reference README.md:64,74; BASELINE.md). Protocol mirrors the
reference speed harness (models/speed/pidnet_speed.py:236-271): warmup,
calibrated iteration count, timed loop between device-sync fences; model
runs the automated BN-folded path in bf16 with the input pre-staged on
device (no host transfers in the loop).
"""

import json

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.tools.speed import measure_fps

BASELINE_FPS = 93.2  # reference README.md:64 (RTX 3090)


def main():
    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    folded = fold_params(params, state, spec)

    fn = jax.jit(
        lambda x: M.apply(
            folded, {}, x, spec, folded=True, compute_dtype=jnp.bfloat16, stem_s2d=True
        )
    )
    x = jax.device_put(jnp.zeros((1, 1024, 2048, 3), jnp.bfloat16))
    latency_ms, fps = measure_fps(fn, x)

    print(
        json.dumps(
            {
                "metric": "pidnet_s_cityscapes_2048x1024_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
