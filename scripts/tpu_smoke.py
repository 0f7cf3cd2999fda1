"""TPU-backend smoke for the Pallas kernels, at the advertised shapes.

The CPU test suite runs every Pallas kernel under `interpret=True` —
right for logic, blind to Mosaic compilation (the round-2 scoped-VMEM
OOM at W=2048 compiled nowhere in CI and crashed on the chip). This
script compiles and EXECUTES ce_front (forward + backward) and
upsample_argmax on the real TPU backend at every shape the README
advertises, checking numerical agreement against the fp32 XLA
formulations:

    python scripts/tpu_smoke.py            # all shapes
    python scripts/tpu_smoke.py --fast     # one shape per kernel

Prints one PASS/FAIL line per check and exits non-zero on any failure;
exits 0 with a SKIP notice when no TPU is attached. `bench.py` runs the
--fast variant so every recorded bench round carries hardware-numerics
evidence (VERDICT r2 items 3 and 6).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

# (name, logits (h, w, c), out (OH, OW)) — 1/8-res logits vs label/crop
# resolution, as configured by the reference recipes:
#   cityscapes train crop 1024x1024 (configs/cityscapes/*.yaml TRAIN.CROP)
#   cityscapes TEST.IMAGE_SIZE 2048x1024 (the round-2 crash shape)
#   camvid 720x960 (configs/camvid/*.yaml)
SHAPES = [
    ("cs_crop_1024x1024", (128, 128, 19), (1024, 1024)),
    ("cs_test_1024x2048", (128, 256, 19), (1024, 2048)),
    ("camvid_720x960", (90, 120, 11), (720, 960)),
]

AGREE_MIN = 0.995


def _agree(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def check_ce_front(name, hwc, out_hw, failures):
    from pidnet_tpu.ops.ce_front import _xla_ce_maps, ce_maps

    h, w, c = hwc
    rng = np.random.default_rng(0)
    logits = (rng.standard_normal((2, h, w, c)) * 2).astype(np.float32)
    labels = rng.integers(0, c + 2, (2, *out_hw)).astype(np.int32)
    labels = np.where(labels >= c, 255, labels)
    cw = (0.8 + rng.random(c)).astype(np.float32)

    def loss_tpu(l):
        nll, wmap = ce_maps(l, labels, cw, 255, out_hw, True)
        return jnp.sum(nll * wmap) / jnp.sum(wmap)

    def loss_xla(l):
        nll, wmap = _xla_ce_maps(l, jnp.asarray(labels), cw, 255, out_hw, True)
        return jnp.sum(nll * wmap) / jnp.sum(wmap)

    try:
        lb = jnp.asarray(logits, jnp.bfloat16)
        lt, gt = jax.jit(jax.value_and_grad(loss_tpu))(lb)
        lt, gt = float(lt), np.asarray(gt, np.float32)
    except Exception as e:  # Mosaic compile failures land here
        failures.append(f"ce_front/{name}: {type(e).__name__}: {e}")
        print(f"FAIL ce_front {name}: {type(e).__name__}")
        return
    lx, gx = jax.jit(jax.value_and_grad(loss_xla))(jnp.asarray(logits))
    lx, gx = float(lx), np.asarray(gx)
    rel = abs(lt - lx) / max(abs(lx), 1e-9)
    cos = float((gt * gx).sum() / np.sqrt((gt**2).sum() * (gx**2).sum()))
    ok = rel < 5e-3 and cos > 0.999
    print(
        f"{'PASS' if ok else 'FAIL'} ce_front {name}: "
        f"loss rel={rel:.2e} grad cos={cos:.6f}"
    )
    if not ok:
        failures.append(f"ce_front/{name}: rel={rel:.2e} cos={cos:.6f}")


def check_upsample_argmax(name, hwc, out_hw, failures):
    from pidnet_tpu.ops.upsample_argmax import _xla_upsample_argmax, upsample_argmax

    h, w, c = hwc
    rng = np.random.default_rng(1)
    logits = (rng.standard_normal((1, h, w, c)) * 2).astype(np.float32)
    try:
        got = np.asarray(
            jax.jit(
                lambda l: upsample_argmax(l, out_hw, True)
            )(jnp.asarray(logits, jnp.bfloat16))
        )
    except Exception as e:
        failures.append(f"upsample_argmax/{name}: {type(e).__name__}: {e}")
        print(f"FAIL upsample_argmax {name}: {type(e).__name__}")
        return
    want = np.asarray(_xla_upsample_argmax(jnp.asarray(logits), out_hw, True))
    agree = _agree(got, want)
    ok = agree >= AGREE_MIN
    print(f"{'PASS' if ok else 'FAIL'} upsample_argmax {name}: agree={agree:.6f}")
    if not ok:
        failures.append(f"upsample_argmax/{name}: agree={agree:.6f}")


def run(fast: bool = False) -> int:
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()!r}, not tpu")
        return 0
    failures: list[str] = []
    shapes = SHAPES[1:2] if fast else SHAPES
    for name, hwc, out_hw in shapes:
        check_ce_front(name, hwc, out_hw, failures)
        check_upsample_argmax(name, hwc, out_hw, failures)
    if failures:
        print(f"{len(failures)} FAILURE(S):")
        for f in failures:
            print(" ", f)
        return 1
    print("tpu_smoke: all checks passed")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="one shape only")
    args = ap.parse_args()
    sys.exit(run(fast=args.fast))
