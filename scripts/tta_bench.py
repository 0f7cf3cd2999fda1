"""Measure TTA (multi-scale + flip) end-to-end on the chip.

The reference declares TEST.MULTI_SCALE / TEST.FLIP_TEST but dropped the
HRNet implementation (reference configs/default.py:84-85) — here they
work (engine.make_ms_flip_inference), so these numbers are pure upside
to document (VERDICT r4 next #8): seconds/image and img/s at the
Cityscapes eval resolution for single-scale, flip-only, and the full
6-scale+flip HRNet protocol, plus the class-map delta vs single-scale
on the trained train2k weights over the Frankfurt frame.

Usage: python scripts/tta_bench.py
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from pidnet_tpu import engine
from pidnet_tpu.config import default_config
from pidnet_tpu.convert import fold_params
from pidnet_tpu.models import pidnet as M

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_cfg(ms: bool, flip: bool):
    cfg = default_config()
    cfg.TEST.IMAGE_SIZE = [2048, 1024]  # width x height (reference yaml)
    cfg.TEST.BASE_SIZE = 2048
    cfg.TEST.MULTI_SCALE = ms
    cfg.TEST.FLIP_TEST = flip
    cfg.MODEL.NUM_OUTPUTS = 2
    cfg.TEST.OUTPUT_INDEX = 1
    return cfg.freeze()


def frame():
    import cv2

    img = cv2.imread(
        os.path.join(REPO, "samples", "frankfurt_000000_002196_leftImg8bit.png")
    )
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return np.ascontiguousarray(
        (img.astype(np.float32)[:, :, ::-1] / 255.0 - mean) / std
    )[None]


def main():
    spec = M.spec_for("pidnet_s", 19, augment=False)
    wz = np.load(os.path.join(REPO, "runs", "train2k", "weights_f16.npz"))
    params = {k[2:]: jnp.asarray(wz[k], jnp.float32) for k in wz.files if k.startswith("p.")}
    state = {k[2:]: jnp.asarray(wz[k], jnp.float32) for k in wz.files if k.startswith("s.")}
    folded = fold_params(params, state, spec)
    x = jnp.asarray(frame())

    results, maps = {}, {}
    for name, (ms, flip) in {
        "single_scale": (False, False),
        "flip_only": (False, True),
        "ms6_flip": (True, True),
    }.items():
        cfg = make_cfg(ms, flip)
        infer = engine.make_ms_flip_inference(
            cfg, spec, folded, {}, folded=True, compute_dtype=jnp.bfloat16
        )
        probs = jax.block_until_ready(infer(x))  # compile + warm
        n = 3 if ms else 10
        t0 = time.perf_counter()
        for _ in range(n):
            probs = infer(x)
        jax.block_until_ready(probs)
        dt = (time.perf_counter() - t0) / n
        maps[name] = np.asarray(jnp.argmax(probs, axis=-1))[0]
        results[name] = dt
        print(f"{name:>13}: {dt*1000:8.1f} ms/image  ({1/dt:6.2f} img/s)")

    for name in ("flip_only", "ms6_flip"):
        agree = float((maps[name] == maps["single_scale"]).mean())
        print(
            f"{name:>13}: classmap vs single-scale agreement {agree:.4f} "
            f"({(1-agree)*100:.2f}% of pixels changed by TTA)"
        )
    print(
        f"TTA cost factor: flip {results['flip_only']/results['single_scale']:.2f}x, "
        f"6-scale+flip {results['ms6_flip']/results['single_scale']:.2f}x"
    )


if __name__ == "__main__":
    main()
