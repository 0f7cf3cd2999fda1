"""Driver benchmark: PIDNet-S Cityscapes-resolution inference FPS on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "argmax_agreement": A, "smoke": "pass"}

Baseline: the reference's published PIDNet-S 93.2 FPS @2048x1024 on an
RTX 3090 (reference README.md:64,74; BASELINE.md). Protocol mirrors the
reference speed harness (models/speed/pidnet_speed.py:236-271): warmup,
calibrated iteration count, timed loop between device-sync fences; model
runs the automated BN-folded path in bf16 with the input pre-staged on
device (no host transfers in the loop).

The FPS number is gated on ON-CHIP correctness (the reference merely
assumed its hand-stripped speed copies matched, pidnet_speed.py:230-271;
round-2 review demanded recorded hardware evidence):

- `argmax_agreement`: class-map agreement of the benchmarked pipeline
  (folded weights + bf16 + Pallas fused upsample-argmax) against the
  fp32 XLA pipeline on a real Cityscapes frame (synthetic fallback),
  asserted >= 0.995 — the run FAILS (exit 1) below that;
- `smoke`: scripts/tpu_smoke.py --fast — Mosaic-compiles and executes
  ce_front fwd+bwd and upsample_argmax at the 1024x2048 shape that
  crashed in round 2, also a hard gate.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.layouts import AutoLayoutFn
from pidnet_tpu.ops.space_to_depth import stem_view
from pidnet_tpu.ops.upsample_argmax import _xla_upsample_argmax, upsample_argmax
from pidnet_tpu.tools.speed import measure_fps

BASELINE_FPS = 93.2  # reference README.md:64 (RTX 3090)
SAMPLE = "/root/reference/samples/frankfurt_000000_002196_leftImg8bit.png"


def _sample_input() -> np.ndarray:
    """The real Frankfurt frame, reference-normalized (datasets/base_dataset.py
    input_transform); deterministic synthetic noise when unavailable."""
    try:
        import cv2

        img = cv2.imread(SAMPLE)
        assert img is not None
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (img.astype(np.float32)[:, :, ::-1] / 255.0 - mean) / std
    except Exception:
        x = np.random.default_rng(0).standard_normal((1024, 2048, 3))
    return np.ascontiguousarray(x, np.float32)[None]


def main():
    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    folded = fold_params(params, state, spec)

    # exactly the production inference pipeline (engine.make_inference*
    # passes wfold=folded) fed the free stem_view input form with AUTO
    # entry layouts (ops/layouts.py) so the graph holds zero input-relayout
    # copies; the FPS number and the numerics gate below cover the program
    # that actually ships
    afn = AutoLayoutFn(
        lambda p, v: M.apply(
            p, {}, v, spec, folded=True, compute_dtype=jnp.bfloat16,
            stem_s2d=True, wfold=True,
        ),
        folded,
        jax.ShapeDtypeStruct((1, 1024, 2048 // 8, 24), jnp.bfloat16),
    )
    x_np = _sample_input()
    pf, x = afn.place(folded, jnp.asarray(stem_view(x_np), jnp.bfloat16))
    fn = lambda v: afn(pf, v)
    latency_ms, fps = measure_fps(fn, x)

    # hardware numerics gate: benchmarked pipeline (folded bf16 + Pallas
    # classmap) vs the fp32 XLA pipeline on the same frame
    out_hw = (1024, 2048)
    speed_map = np.asarray(
        jax.jit(lambda logits: upsample_argmax(logits, out_hw, True))(fn(x))
    )
    ref_fn = jax.jit(
        lambda v: _xla_upsample_argmax(
            M.apply(params, state, v, spec, train=False), out_hw, True
        )
    )
    ref_map = np.asarray(ref_fn(jnp.asarray(x_np)))
    agreement = float((speed_map == ref_map).mean())

    smoke_rc = 0
    if jax.default_backend() == "tpu":
        sys.path.insert(0, "scripts")
        from tpu_smoke import run as smoke_run

        smoke_rc = smoke_run(fast=True)

    print(
        json.dumps(
            {
                "metric": "pidnet_s_cityscapes_2048x1024_fps",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "argmax_agreement": round(agreement, 6),
                "smoke": "pass" if smoke_rc == 0 else "FAIL",
            }
        )
    )
    if agreement < 0.995 or smoke_rc != 0:
        sys.exit(1)


if __name__ == "__main__":
    main()
