"""AOT serving export: a self-contained, serialized inference artifact.

The reference's deployment story stops at "load the .pt and run torch"
(tools/custom.py:74-103); real-time serving there would lean on TensorRT,
which the README explicitly does NOT use (reference README.md:74). The
TPU-native equivalent is `jax.export`: lower the full folded inference
pipeline (BN-folded conv core, space-to-depth stem, W-folded branch
stages, bf16 MXU compute, full-resolution upsample + argmax) to a
StableHLO artifact with the weights baked in as constants, serialized to
one file. The artifact

- needs NO model code, NO checkpoint and NO Python framework state to
  run — `load_serving(blob).call(x)` is the whole API;
- is lowered for BOTH 'tpu' and 'cpu' by default (cross-platform
  export), so the same file serves on a TPU host and on a CPU fallback;
- runs the identical program to `tools/custom.py --bf16` / `bench.py`
  except the final class-map stage, which uses the XLA resize+argmax
  formulation instead of the Pallas fused kernel: the Pallas call embeds
  a Mosaic payload that only lowers for the backend present at trace
  time, which would defeat cross-platform serialization. Measured on
  the chip the XLA classmap costs ~0.2 ms over the fused kernel at
  2048x1024 — the price of a portable artifact.

Weights-as-constants was measured equal to weights-as-arguments on the
chip (docs/DESIGN.md round-3 notes), and it is what makes the artifact
self-contained.

Input contract: normalized f32 NHWC (the reference's ImageNet
normalization, datasets/base_dataset.py:36-44) with the static shape
given at export time. Output: int32 (N, H, W) class map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pidnet_tpu.ops.resize import resize_bilinear


def make_serving_fn(
    folded_params: dict,
    spec,
    *,
    align_corners: bool = True,
    stem_s2d: bool = True,
    wfold: bool = True,
):
    """(x: f32 NHWC, normalized) -> int32 (N,H,W) class map.

    `folded_params` from `convert.fold.fold_params`; captured by closure
    so export bakes them in as constants. `align_corners=True` matches
    the reference's eval/custom upsampling (tools/custom.py:93,
    configs/default.py:32).
    """
    from pidnet_tpu.models import pidnet as M

    def fn(x):
        logits = M.apply(
            folded_params,
            {},
            x,
            spec,
            folded=True,
            compute_dtype=jnp.bfloat16,
            stem_s2d=stem_s2d,
            wfold=wfold,
        )
        if isinstance(logits, (list, tuple)):  # augment spec: final head
            logits = logits[-2] if len(logits) > 2 else logits[-1]
        up = resize_bilinear(
            logits.astype(jnp.float32), (x.shape[1], x.shape[2]), align_corners
        )
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    return fn


def export_serving(
    params: dict,
    state: dict,
    spec,
    hw: tuple[int, int],
    *,
    batch: int = 1,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    align_corners: bool = True,
    stem_s2d: bool = True,
    wfold: bool = True,
) -> bytes:
    """Fold + lower + serialize. Returns the artifact bytes."""
    from pidnet_tpu.convert import fold_params

    folded = fold_params(params, state, spec)
    fn = make_serving_fn(
        folded,
        spec,
        align_corners=align_corners,
        stem_s2d=stem_s2d,
        wfold=wfold,
    )
    x_spec = jax.ShapeDtypeStruct((batch, int(hw[0]), int(hw[1]), 3), jnp.float32)
    exported = jax.export.export(jax.jit(fn), platforms=list(platforms))(x_spec)
    return bytes(exported.serialize())


def load_serving(blob: bytes | str):
    """Deserialize an artifact (bytes or a file path).

    Returns the `jax.export.Exported`; run it as `loaded.call(x)` (jit-
    compatible: `jax.jit(loaded.call)` caches the executable).
    """
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    return jax.export.deserialize(bytearray(blob))
