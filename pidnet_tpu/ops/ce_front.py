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
            logit vector; per (image, column-tile) the W-interp of all
            class planes is computed once into a VMEM scratch, then each
            row-tile is one wide H-interp matmul
  backward: dL = Aᵀ · (g ⊙ (softmax(z) - onehot(label))) · B, recomputing
            z tile-by-tile (flash-style: nothing full-res ever hits HBM),
            accumulated in the output block across row/column tiles

The output width is tiled (grid dim 1) so the per-step scoped-VMEM
footprint stays bounded at any crop — the untiled round-2 kernel was
*selected* at W=2048 and then failed Mosaic compilation with a 19.76 MiB
scoped-vmem request against the 16 MiB limit. `_plan` now bounds the
TOTAL footprint (operand/output blocks with pipeline double-buffering,
scratch, and the kernel's live f32 temporaries) and picks the widest
column tile that fits; widths that are not lane multiples (CamVid 960)
are zero-padded to the next multiple of 128 with masked columns
contributing exact zeros to both outputs and the gradient.

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

# Scoped-VMEM budget per grid step. The hardware limit is 16 MiB
# (--xla_tpu_scoped_vmem_limit_kib is not tunable through the axon
# client); 12 MiB leaves headroom for Mosaic-internal buffers beyond the
# _footprint model, which reproduced the observed 19.76 MiB failure at
# (128,256,19)->(1024,2048) to within ~2%.
_VMEM_BUDGET = 12 * 2**20


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad16(x: int) -> int:
    # bf16 sublane tile is (16,128): bf16 blocks pad the second-to-last
    # dim to 16, not the f32 tile's 8.
    return -(-x // 16) * 16


def _footprint(h: int, w: int, c: int, th: int, tw: int, *, bwd: bool) -> int:
    """Model of the kernel's scoped-VMEM bytes for one grid step.

    Blocks streamed by the Pallas pipeline are double-buffered (×2);
    scratch and revisited accumulator blocks are single instances. Lane
    (last dim → ×128) and sublane (second-to-last → ×8, ×16 for bf16)
    padding is applied as Mosaic would.
    """
    wp, hp = _pad128(w), _pad8(h)
    a = _pad16(th) * _pad128(h) * 2
    l = c * _pad16(h) * wp * 2  # noqa: E741
    bt = _pad16(w) * tw * 2
    lab = _pad8(th) * tw * 4
    scratch = _pad16(h) * c * tw * 2
    v = _pad8(th) * c * tw * 4  # the H-interp matmul result, live in f32
    ew = 4 * _pad8(th) * tw * 4  # m/s/z-or-p temporaries
    total = 2 * (a + l + bt + lab) + scratch + v + ew
    if bwd:
        b = tw * wp * 2
        g = _pad8(th) * tw * 4
        dl = c * hp * wp * 4  # revisited accumulator block, single copy
        tmp = _pad16(th) * tw * 2 + _pad8(th) * wp * 4 + hp * wp * 4  # dz, t1, t2
        total += 2 * (b + g) + dl + tmp
    else:
        total += 2 * 2 * _pad8(th) * tw * 4  # nll + w output blocks
    return total


def _plan(h: int, w: int, c: int, oh: int, ow: int, *, bwd: bool):
    """Pick (th, tw, ow_pad) so the kernel fits scoped VMEM, else None."""
    th = _row_tile(oh, cap=32)
    if th == 0:
        return None
    ow_pad = _pad128(ow)
    tws = [t for t in range(128, ow_pad + 1, 128) if ow_pad % t == 0]
    for tw in sorted(tws, reverse=True):
        if _footprint(h, w, c, th, tw, bwd=bwd) <= _VMEM_BUDGET:
            return th, tw, ow_pad
    return None


def _fill_lw(l_ref, bt_ref, lw_ref, C: int, TW: int):
    """W-interp every class plane into the VMEM scratch, for this image's
    current column tile (once per (image, column-tile))."""
    for c in range(C):
        lw_ref[:, c * TW : (c + 1) * TW] = jnp.dot(
            l_ref[0, c], bt_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)


def _fwd_kernel(a_ref, l_ref, bt_ref, lab_ref, nll_ref, w_ref, lw_ref, *,
                cw: tuple, TW: int, ignore: int):
    C = len(cw)

    @pl.when(pl.program_id(2) == 0)
    def _():
        _fill_lw(l_ref, bt_ref, lw_ref, C, TW)

    V = jnp.dot(a_ref[:], lw_ref[:], preferred_element_type=jnp.float32)
    labels = lab_ref[0]  # (TH, TW) int32
    valid = labels != ignore

    m = V[:, 0:TW]
    for c in range(1, C):
        m = jnp.maximum(m, V[:, c * TW : (c + 1) * TW])
    s = jnp.zeros_like(m)
    z_true = jnp.zeros_like(m)
    w = jnp.zeros_like(m)
    for c in range(C):
        z = V[:, c * TW : (c + 1) * TW]
        s = s + jnp.exp(z - m)
        hit = labels == c
        z_true = jnp.where(hit, z, z_true)
        w = jnp.where(hit, cw[c], w)
    lse = jnp.log(s) + m
    nll_ref[0] = jnp.where(valid, lse - z_true, 0.0)
    w_ref[0] = jnp.where(valid, w, 0.0)


def _bwd_kernel(a_ref, l_ref, bt_ref, b_ref, lab_ref, g_ref, dl_ref, lw_ref,
                *, C: int, TW: int, ignore: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        _fill_lw(l_ref, bt_ref, lw_ref, C, TW)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        dl_ref[0] = jnp.zeros_like(dl_ref[0])

    V = jnp.dot(a_ref[:], lw_ref[:], preferred_element_type=jnp.float32)
    labels = lab_ref[0]
    g = g_ref[0] * (labels != ignore)  # invalid pixels carry no gradient

    m = V[:, 0:TW]
    for c in range(1, C):
        m = jnp.maximum(m, V[:, c * TW : (c + 1) * TW])
    s = jnp.zeros_like(m)
    for c in range(C):
        s = s + jnp.exp(V[:, c * TW : (c + 1) * TW] - m)
    g_inv_s = g / s

    At = a_ref[:].T  # (h, TH)
    for c in range(C):
        p_g = jnp.exp(V[:, c * TW : (c + 1) * TW] - m) * g_inv_s
        dz = (p_g - g * (labels == c)).astype(jnp.bfloat16)  # (TH, TW)
        t1 = jnp.dot(dz, b_ref[:], preferred_element_type=jnp.float32)
        t2 = jnp.dot(
            At, t1.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )  # (h, w)
        dl_ref[0, c] += t2


def _xla_ce_maps(logits, labels, class_weights, ignore, out_hw, align_corners):
    """Reference XLA path (also the CPU/parity fallback): resize, then the
    shared one-hot CE map construction (losses.criterion._per_pixel_ce —
    one source of truth for the ignore/safe-label/class-weight logic)."""
    from pidnet_tpu.losses.criterion import _per_pixel_ce
    from pidnet_tpu.ops.resize import resize_bilinear

    up = resize_bilinear(logits, out_hw, align_corners)
    nll, w, valid = _per_pixel_ce(up, labels, class_weights, ignore)
    return jnp.where(valid, nll, 0.0), w


def _tileable(logits, out_hw) -> bool:
    n, h, w, c = logits.shape
    oh, ow = out_hw
    return (
        _plan(h, w, c, oh, ow, bwd=False) is not None
        and _plan(h, w, c, oh, ow, bwd=True) is not None
    )


def _wpad_cols(bt, ow: int, ow_pad: int):
    """Zero-pad the (w, ow) W-interp operator to (w, ow_pad): padded
    output columns see all-zero interpolation weights."""
    if ow_pad == ow:
        return bt
    return np.pad(bt, ((0, 0), (0, ow_pad - ow)))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _ce_front_pallas(logits, labels, cw, ignore, oh, ow, interpret):
    return _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret)


def _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret):
    n, h, w, c = logits.shape
    th, tw, ow_pad = _plan(h, w, c, oh, ow, bwd=False)
    a = jnp.asarray(_interp_matrix(h, oh, True), jnp.bfloat16)
    bt = jnp.asarray(
        _wpad_cols(np.ascontiguousarray(_interp_matrix(w, ow, True).T), ow, ow_pad),
        jnp.bfloat16,
    )
    lt = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.bfloat16)
    labels = labels.astype(jnp.int32)
    if ow_pad != ow:
        # padded label columns are ignore -> nll=0, w=0 there by definition
        labels = jnp.pad(labels, ((0, 0), (0, 0), (0, ow_pad - ow)),
                         constant_values=ignore)
    vma = getattr(jax.typeof(logits), "vma", frozenset())

    nll, wmap = pl.pallas_call(
        partial(_fwd_kernel, cw=cw, TW=tw, ignore=ignore),
        grid=(n, ow_pad // tw, oh // th),
        in_specs=[
            pl.BlockSpec((th, h), lambda i, k, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i, k, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tw), lambda i, k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, oh, ow_pad), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n, oh, ow_pad), jnp.float32, vma=vma),
        ],
        scratch_shapes=[pltpu.VMEM((h, c * tw), jnp.bfloat16)],
        interpret=interpret,
    )(a, lt, bt, labels)
    if ow_pad != ow:
        nll, wmap = nll[..., :ow], wmap[..., :ow]
    return nll, wmap


def _ce_front_fwd(logits, labels, cw, ignore, oh, ow, interpret):
    out = _ce_fwd_call(logits, labels, cw, ignore, oh, ow, interpret)
    return out, (logits, labels)


def _ce_front_bwd(cw, ignore, oh, ow, interpret, res, grads):
    logits, labels = res
    g_nll, _ = grads  # the weight map is label-only: no logits gradient
    n, h, w, c = logits.shape
    th, tw, ow_pad = _plan(h, w, c, oh, ow, bwd=True)
    a = jnp.asarray(_interp_matrix(h, oh, True), jnp.bfloat16)
    b_np = _interp_matrix(w, ow, True)  # (OW, w)
    b = jnp.asarray(np.pad(b_np, ((0, ow_pad - ow), (0, 0))), jnp.bfloat16)
    bt = jnp.asarray(
        _wpad_cols(np.ascontiguousarray(b_np.T), ow, ow_pad), jnp.bfloat16
    )
    lt = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.bfloat16)
    labels = labels.astype(jnp.int32)
    if ow_pad != ow:
        # padded columns: zero upstream gradient AND ignore labels, so
        # dz there is exactly zero on both softmax and one-hot terms
        labels = jnp.pad(labels, ((0, 0), (0, 0), (0, ow_pad - ow)),
                         constant_values=ignore)
        g_nll = jnp.pad(g_nll, ((0, 0), (0, 0), (0, ow_pad - ow)))
    vma = getattr(jax.typeof(logits), "vma", frozenset())

    dl = pl.pallas_call(
        partial(_bwd_kernel, C=c, TW=tw, ignore=ignore),
        grid=(n, ow_pad // tw, oh // th),
        in_specs=[
            pl.BlockSpec((th, h), lambda i, k, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i, k, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, tw), lambda i, k, j: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, w), lambda i, k, j: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda i, k, j: (i, j, k), memory_space=pltpu.VMEM),
        ],
        # accumulator: one (C,h,w) block per image, revisited across every
        # (column-tile, row-tile) step — index map constant in (k, j)
        out_specs=pl.BlockSpec(
            (1, c, h, w), lambda i, k, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32, vma=vma),
        scratch_shapes=[pltpu.VMEM((h, c * tw), jnp.bfloat16)],
        interpret=interpret,
    )(a, lt, bt, b, labels, g_nll)
    dl = dl.transpose(0, 2, 3, 1).astype(logits.dtype)  # (N,C,h,w)->(N,h,w,C)
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
    exact XLA path otherwise (fp32 parity, CPU, shapes whose VMEM plan
    doesn't fit — see `_plan`). Ignored pixels yield (0, 0) on both
    paths."""
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
