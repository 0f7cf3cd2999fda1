"""Fused bilinear-upsample + argmax (Pallas TPU kernel) for the eval path.

The reference eval pipeline upsamples 1/8-resolution logits to the input
size and argmaxes them (reference datasets/base_dataset.py:136-150 +
utils/utils.py:129-152). Done as separate XLA ops that materializes a
(N, 1024, 2048, C) tensor in HBM (~76 MB bf16 per Cityscapes image) just
to reduce it away again. This kernel keeps everything in VMEM: for each
row-tile it H-interpolates one class plane with a small matmul,
W-interpolates with a second matmul, and folds the plane into a running
(max, argmax) — only the (N, H, W) int32 class map ever touches HBM.

exp() from the reference inference path is dropped: it is monotonic and
argmax-invariant (SURVEY §2.4). Interpolation matrices come from
ops.resize._interp_matrix, so both align_corners semantics are exact;
matmuls run in bf16 with fp32 accumulation (the class decision is
boundary-insensitive; agreement vs the fp32 XLA path is test-gated).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pidnet_tpu.ops.resize import _interp_matrix, resize_bilinear


def _row_tile(oh: int, cap: int = 128) -> int:
    """Largest divisor of `oh` that is a multiple of 8 and <= cap."""
    for t in range(min(cap, oh), 7, -1):
        if oh % t == 0 and t % 8 == 0:
            return t
    return 0


def _xla_upsample_argmax(logits, out_hw, align_corners):
    up = resize_bilinear(logits, out_hw, align_corners)
    return jnp.argmax(up, axis=-1).astype(jnp.int32)


def _kernel(a_ref, l_ref, bt_ref, out_ref, lw_ref, *, num_classes: int,
            ow: int, chunk: int):
    """Grid (N, oh/TH). At the first row-tile of each image the W-interp of
    every class plane lands in the `lw_ref` VMEM scratch (one matmul per
    class, reused by all row-tiles — scratch persists across sequential
    grid steps). Each row-tile then H-interpolates `chunk` classes per MXU
    matmul and folds them into a running (max, argmax)."""

    @pl.when(pl.program_id(1) == 0)
    def _fill():
        for c in range(num_classes):
            lw_ref[:, c * ow : (c + 1) * ow] = jnp.dot(
                l_ref[0, c], bt_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

    A = a_ref[:]  # (TH, h) bf16
    best = None
    idx = None
    for c0 in range(0, num_classes, chunk):
        k = min(chunk, num_classes - c0)
        V = jnp.dot(  # (TH, k*ow) f32 — one wide matmul per class chunk
            A, lw_ref[:, c0 * ow : (c0 + k) * ow],
            preferred_element_type=jnp.float32,
        )
        for i in range(k):
            v = V[:, i * ow : (i + 1) * ow]
            if best is None:
                best = v
                idx = jnp.zeros(v.shape, jnp.int32)
            else:
                upd = v > best  # strict: ties keep the LOWEST class
                best = jnp.where(upd, v, best)
                idx = jnp.where(upd, c0 + i, idx)
    out_ref[0] = idx


def upsample_argmax(
    logits, out_hw, align_corners: bool, *, interpret: bool = False
):
    """(N,h,w,C) float -> (N,oh,ow) int32 class map.

    Uses the fused Pallas kernel on TPU (or under `interpret=True` for
    tests); falls back to the XLA resize+argmax pair elsewhere or for
    shapes the kernel doesn't tile."""
    from pidnet_tpu.ops.pallas_gate import pallas_enabled

    n, h, w, c = logits.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    th = _row_tile(oh, cap=64)
    on_tpu = jax.default_backend() == "tpu"
    # VMEM budget: scratch (h, C*ow) bf16 + V chunk + best/idx must fit
    scratch_mb = h * c * ow * 2 / 2**20
    if (
        (h, w) == (oh, ow)
        or th == 0
        or scratch_mb > 11
        or (not on_tpu and not interpret)
        or not pallas_enabled()
    ):
        return _xla_upsample_argmax(logits, out_hw, align_corners)

    a = jnp.asarray(_interp_matrix(h, oh, align_corners), jnp.bfloat16)
    bt = jnp.asarray(_interp_matrix(w, ow, align_corners).T, jnp.bfloat16)
    lt = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.bfloat16)  # (N,C,h,w)
    chunk = max(1, (2 << 20) // (4 * th * ow))  # ~2MB f32 V tile
    # under shard_map the output must declare how it varies across mesh
    # axes — it varies exactly like the input logits
    vma = getattr(jax.typeof(logits), "vma", frozenset())

    return pl.pallas_call(
        partial(_kernel, num_classes=c, ow=ow, chunk=chunk),
        grid=(n, oh // th),
        in_specs=[
            pl.BlockSpec((th, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow), jnp.int32, vma=vma),
        scratch_shapes=[pltpu.VMEM((h, c * ow), jnp.bfloat16)],
        interpret=interpret,
    )(a, lt, bt)
