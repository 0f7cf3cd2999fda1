"""Fused loss front (Pallas TPU): bilinear-upsample + log-softmax + NLL.

The training objective evaluates cross-entropy at LABEL resolution on
logits produced at 1/8 resolution (reference utils/utils.py:41-46 +
utils/criterion.py): the stock XLA path materializes (N,1024,1024,19)
upsampled logits in HBM (~228 MB bf16 per head per step at batch 6) and
re-reads them for log-softmax/NLL — ~20% of the round-2 training step.

This kernel produces the per-pixel CE ingredients directly from the
low-res logits, entirely in VMEM:

  forward:  nll[y,x] = logsumexp_c(z) - z[label],  w[y,x] = cw[label]·valid
            where z = (A @ L @ Bᵀ)[y,x,:] is the bilinearly upsampled
            logit vector; per image the W-interp of all class planes is
            computed once into a VMEM scratch, then each row-tile is one
            wide H-interp matmul
  backward: dL = Aᵀ · (g ⊙ (softmax(z) - onehot(label))) · B, recomputing
            z tile-by-tile (flash-style: nothing full-res ever hits HBM),
            accumulated in the output block across row-tiles

Used on the bf16 training path (compute_dtype=bfloat16 on TPU); the fp32
parity path keeps the exact XLA route. Matmuls run bf16 with fp32
accumulation; log/exp in f32. Invalid (ignore) pixels get nll=0, w=0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pidnet_tpu.ops.resize import _interp_matrix
from pidnet_tpu.ops.upsample_argmax import _row_tile


def _fill_lw(l_ref, bt_ref, lw_ref, C: int, OW: int):
    """W-interp every class plane into the VMEM scratch (once per image)."""
    for c in range(C):
        lw_ref[:, c * OW : (c + 1) * OW] = jnp.dot(
            l_ref[0, c], bt_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)


def _fwd_kernel(a_ref, l_ref, bt_ref, lab_ref, nll_ref, w_ref, lw_ref, *,
                cw: tuple, OW: int, ignore: int):
    C = len(cw)

    @pl.when(pl.program_id(1) == 0)
    def _():
        _fill_lw(l_ref, bt_ref, lw_ref, C, OW)

    V = jnp.dot(a_ref[:], lw_ref[:], preferred_element_type=jnp.float32)
    labels = lab_ref[0]  # (TH, OW) int32
    valid = labels != ignore

    m = V[:, 0:OW]
    for c in range(1, C):
        m = jnp.maximum(m, V[:, c * OW : (c + 1) * OW])
    s = jnp.zeros_like(m)
    z_true = jnp.zeros_like(m)
    w = jnp.zeros_like(m)
    for c in range(C):
        z = V[:, c * OW : (c + 1) * OW]
        s = s + jnp.exp(z - m)
        hit = labels == c
        z_true = jnp.where(hit, z, z_true)
        w = jnp.where(hit, cw[c], w)
    lse = jnp.log(s) + m
    nll_ref[0] = jnp.where(valid, lse - z_true, 0.0)
    w_ref[0] = jnp.where(valid, w, 0.0)


def _bwd_kernel(a_ref, l_ref, bt_ref, b_ref, lab_ref, g_ref, dl_ref, lw_ref,
                *, C: int, OW: int, w: int, ignore: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        _fill_lw(l_ref, bt_ref, lw_ref, C, OW)
        dl_ref[0] = jnp.zeros_like(dl_ref[0])

    V = jnp.dot(a_ref[:], lw_ref[:], preferred_element_type=jnp.float32)
    labels = lab_ref[0]
    g = g_ref[0] * (labels != ignore)  # invalid pixels carry no gradient

    m = V[:, 0:OW]
    for c in range(1, C):
        m = jnp.maximum(m, V[:, c * OW : (c + 1) * OW])
    s = jnp.zeros_like(m)
    for c in range(C):
        s = s + jnp.exp(V[:, c * OW : (c + 1) * OW] - m)
    g_inv_s = g / s

    At = a_ref[:].T  # (h, TH)
    for c in range(C):
        p_g = jnp.exp(V[:, c * OW : (c + 1) * OW] - m) * g_inv_s
        dz = (p_g - g * (labels == c)).astype(jnp.bfloat16)  # (TH, OW)
        t1 = jnp.dot(dz, b_ref[:], preferred_element_type=jnp.float32)
        t2 = jnp.dot(
            At, t1.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )  # (h, w)
        dl_ref[0, :, c * w : (c + 1) * w] += t2


def _xla_ce_maps(logits, labels, class_weights, ignore, out_hw, align_corners):
    """Reference XLA path (also the CPU/parity fallback)."""
    from pidnet_tpu.ops.resize import resize_bilinear

    up = resize_bilinear(logits, out_hw, align_corners)
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    onehot = safe[..., None] == jnp.arange(up.shape[-1], dtype=jnp.int32)
    logp = jax.nn.log_softmax(up.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    cw = jnp.asarray(class_weights, jnp.float32)
    w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
    return jnp.where(valid, nll, 0.0), jnp.where(valid, w, 0.0)


def _tileable(logits, out_hw) -> bool:
    n, h, w, c = logits.shape
    oh, ow = out_hw
    th = _row_tile(oh, cap=32)
    scratch_mb = h * c * ow * 2 / 2**20
    return th > 0 and ow % 128 == 0 and w % 128 == 0 and scratch_mb <= 10


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _ce_front_pallas(logits, labels, cw, ignore, oh, ow, interpret):
    return _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret)


def _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret):
    n, h, w, c = logits.shape
    th = _row_tile(oh, cap=32)
    a = jnp.asarray(_interp_matrix(h, oh, True), jnp.bfloat16)
    bt = jnp.asarray(
        np.ascontiguousarray(_interp_matrix(w, ow, True).T), jnp.bfloat16
    )
    lt = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.bfloat16)
    vma = getattr(jax.typeof(logits), "vma", frozenset())

    nll, wmap = pl.pallas_call(
        partial(_fwd_kernel, cw=cw, OW=ow, ignore=ignore),
        grid=(n, oh // th),
        in_specs=[
            pl.BlockSpec((th, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, oh, ow), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n, oh, ow), jnp.float32, vma=vma),
        ],
        scratch_shapes=[pltpu.VMEM((h, c * ow), jnp.bfloat16)],
        interpret=interpret,
    )(a, lt, bt, labels.astype(jnp.int32))
    return nll, wmap


def _ce_front_fwd(logits, labels, cw, ignore, oh, ow, interpret):
    out = _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret)
    return out, (logits, labels)


def _ce_front_bwd(cw, ignore, oh, ow, interpret, res, grads):
    logits, labels = res
    g_nll, _ = grads  # the weight map is label-only: no logits gradient
    n, h, w, c = logits.shape
    th = _row_tile(oh, cap=32)
    a = jnp.asarray(_interp_matrix(h, oh, True), jnp.bfloat16)
    b = jnp.asarray(_interp_matrix(w, ow, True), jnp.bfloat16)  # (OW, w)
    bt = jnp.asarray(
        np.ascontiguousarray(_interp_matrix(w, ow, True).T), jnp.bfloat16
    )
    lt = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.bfloat16)
    vma = getattr(jax.typeof(logits), "vma", frozenset())

    dl = pl.pallas_call(
        partial(_bwd_kernel, C=c, OW=ow, w=w, ignore=ignore),
        grid=(n, oh // th),
        in_specs=[
            pl.BlockSpec((th, h), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, ow), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, ow), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, h, c * w), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, c * w), jnp.float32, vma=vma),
        scratch_shapes=[pltpu.VMEM((h, c * ow), jnp.bfloat16)],
        interpret=interpret,
    )(a, lt, bt, b, labels.astype(jnp.int32), g_nll)
    # (N, h, C*w) c-major -> (N, h, w, C)
    dl = dl.reshape(n, h, c, w).transpose(0, 1, 3, 2).astype(logits.dtype)
    return dl, None


_ce_front_pallas.defvjp(_ce_front_fwd, _ce_front_bwd)


def ce_maps(
    logits,
    labels,
    class_weights,
    ignore_label: int,
    out_hw,
    align_corners: bool,
    *,
    interpret: bool = False,
):
    """(per-pixel nll, per-pixel weight) at label resolution from logits.

    Differentiable w.r.t. `logits`. Fused Pallas path on TPU for bf16
    low-res logits with align_corners=True (the training configuration);
    exact XLA path otherwise (fp32 parity, CPU, odd shapes). Ignored
    pixels yield (0, 0) on both paths."""
    oh, ow = int(out_hw[0]), int(out_hw[1])
    cw = (
        np.ones((logits.shape[-1],), np.float32)
        if class_weights is None
        else np.asarray(class_weights, np.float32)
    )
    from pidnet_tpu.ops.pallas_gate import pallas_enabled

    on_tpu = jax.default_backend() == "tpu"
    if (
        logits.dtype == jnp.bfloat16
        and align_corners
        and logits.shape[1:3] != (oh, ow)
        and _tileable(logits, (oh, ow))
        and (on_tpu or interpret)
        and pallas_enabled()
    ):
        return _ce_front_pallas(
            logits, labels, tuple(float(x) for x in cw), int(ignore_label),
            oh, ow, interpret,
        )
    return _xla_ce_maps(logits, labels, cw, ignore_label, (oh, ow), align_corners)
