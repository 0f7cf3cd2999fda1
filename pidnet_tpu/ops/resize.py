"""Bilinear resize with exact PyTorch `F.interpolate` semantics, as matmuls.

The reference net mixes both align_corners modes (False inside the network,
reference models/pidnet.py:13; True at loss/eval time via
MODEL.ALIGN_CORNERS, reference configs/default.py:32 and utils/utils.py:46;
True in tools/custom.py:93; PagFM hard-codes False at
models/model_utils.py:300,308). `jax.image.resize` implements neither mode
exactly, so we build the 1-D interpolation operators explicitly and apply
them as two small dense matmuls:

    y = A_h @ x @ A_w^T        (per batch/channel, NHWC via einsum)

Each row of A has at most two non-zeros, but at the sizes PIDNet uses
(e.g. 16->128 per axis) a dense matmul runs on the MXU and is both exact
(fp32 weights) and fast; XLA fuses the surrounding elementwise work.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) fp32 bilinear interpolation operator.

    Matches torch's upsample_bilinear2d source-index computation:
    align_corners=True:  src = i * (in-1)/(out-1)      (0 when out == 1)
    align_corners=False: src = max(0, (i+0.5) * in/out - 0.5)
    """
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == out_size:
        np.fill_diagonal(A, 1.0)
        return A
    # source indices computed in float32, matching torch's CPU float path
    # (ATen area_pixel_compute_source_index<float>) to the ulp — float64
    # here yields weights off by ~1e-6 and logits off by ~2e-5.
    i = np.arange(out_size, dtype=np.float32)
    if align_corners:
        scale = np.float32(in_size - 1) / np.float32(out_size - 1) if out_size > 1 else np.float32(0)
        src = i * scale
    else:
        scale = np.float32(in_size) / np.float32(out_size)
        src = np.maximum((i + np.float32(0.5)) * scale - np.float32(0.5), np.float32(0))
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = 1.0 - w1
    np.add.at(A, (np.arange(out_size), i0), w0)
    np.add.at(A, (np.arange(out_size), i1), w1)
    return A


# Constant-tap W-upsample kernels emitting the W-folded layout directly.
# Interior align_corners=False phases are block-periodic, so the
# upsample-then-wfold composition is a short conv over the (edge-
# replicate padded) input columns. Tap tables: {(t, b): weight} places
# `weight` at kernel tap t for output group b (out column f*J + b); each
# (s=scale, f=fold) pair also fixes (T=kernel width, window stride,
# lhs_dilation, right conv pad). For s=4, f=2 consecutive out blocks
# interleave input parities, which an lhs_dilation=2 kernel expresses
# (even taps hit real columns for even blocks, odd taps for odd blocks).
_WFOLD_UP_FORMS = {
    # s=2: out[2k] = 0.25 in[k-1] + 0.75 in[k]; out[2k+1] = 0.75/0.25
    (2, 2): ({(0, 0): 0.25, (1, 0): 0.75, (1, 1): 0.75, (2, 1): 0.25},
             3, 1, 1, 0),
    (2, 4): ({(0, 0): 0.25, (1, 0): 0.75, (1, 1): 0.75, (2, 1): 0.25,
              (1, 2): 0.25, (2, 2): 0.75, (2, 3): 0.75, (3, 3): 0.25},
             4, 2, 1, 0),
    # s=4 phases: 0.375/0.625, 0.125/0.875, 0.875/0.125, 0.625/0.375
    (4, 4): ({(0, 0): 0.375, (1, 0): 0.625, (0, 1): 0.125, (1, 1): 0.875,
              (1, 2): 0.875, (2, 2): 0.125, (1, 3): 0.625, (2, 3): 0.375},
             3, 1, 1, 0),
    (4, 2): ({(0, 0): 0.375, (2, 0): 0.625, (1, 0): 0.875, (3, 0): 0.125,
              (0, 1): 0.125, (2, 1): 0.875, (1, 1): 0.625, (3, 1): 0.375},
             5, 1, 2, 1),
}


@lru_cache(maxsize=None)
def _wfold_up_kernel(c: int, f: int, s: int) -> tuple[np.ndarray, int, int, int]:
    """(1,T,C,f*C) kernel + (stride, lhs_dilation, right_pad) for the
    W-folded s-x bilinear upsample (see _WFOLD_UP_FORMS)."""
    taps, T, stride, ld, pr = _WFOLD_UP_FORMS[(s, f)]
    K = np.zeros((1, T, c, f * c), np.float32)
    for (t, b), wgt in taps.items():
        for ch in range(c):
            K[0, t, ch, b * c + ch] = wgt
    return K, stride, ld, pr


# H-axis s-x upsample as a dilated conv (bf16 speed path only). The
# interior align_corners=False phases are the same 2-tap forms as the W
# tables; with the input edge-padded by one row and lhs_dilation=s, one
# shared kernel of width 2s encodes every phase (tap parity selects the
# real rows). Why a conv and not the interpolation einsum: the einsum is
# lowered as a batched matmul whose output XLA lays out matmul-style
# ({3,0,2,1:T(2,128)}), and every folded elementwise consumer downstream
# inherits that layout — measured +0.44 ms/step of copies at batch 1 in
# the stay-folded region. A conv keeps the NHWC conv layout family end
# to end. taps: (weights, pl, pr) for padding=((pl,pr),...).
_H_UP_FORMS = {
    2: ([0.25, 0.75, 0.75, 0.25], 0, 0),
    4: ([0.125, 0.375, 0.625, 0.875, 0.875, 0.625, 0.375, 0.125], 1, 1),
}


@lru_cache(maxsize=None)
def _h_up_kernel(c: int, s: int) -> tuple[np.ndarray, int, int]:
    taps, pl, pr = _H_UP_FORMS[s]
    K = np.zeros((len(taps), 1, c, c), np.float32)
    for t, wgt in enumerate(taps):
        for ch in range(c):
            K[t, 0, ch, ch] = wgt
    return K, pl, pr


def resize_wfold(x: jnp.ndarray, f: int, scale: int = 2) -> jnp.ndarray:
    """Bilinear `scale`-x upsample (align_corners=False) emitting the
    W-folded layout directly: (N,H,W,C) -> (N,sH,sW/f,f*C) with NO
    reshape/relayout in the graph — H by the interpolation einsum, W by a
    constant-tap MXU conv (`_wfold_up_kernel`; scale in {2,4}, f in
    {2,4}). Bit-identical to `wfold(resize_bilinear(x, (sH,sW), False),
    f)` in bf16 (one f32 accumulation, one rounding in both); fp32 agrees
    to 1-2 ulp (the conv's FMA/accumulation order differs from the
    einsum's).

    Used to hand W-folded P/D branch stages their upsampled I-branch
    partners (pag y/y_q at 1/16 and 1/32, diff3/diff4) without leaving
    folded space (models/pidnet.py stay-folded region)."""
    from jax import lax as _lax

    from jax import lax as _lax2

    s = int(scale)
    n, h, w, c = x.shape
    assert (s * w) % f == 0, (x.shape, f, s)
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # speed path: H-upsample as a dilated conv (layout-friendly, see
        # _H_UP_FORMS). Bit-equal to the einsum: each output row is a
        # 2-tap interpolation whose bf16 products are exact in f32 and
        # whose 2-term f32 sum is correctly rounded in any order.
        y = x
        precision = None
        Kh, pl, pr = _h_up_kernel(c, s)
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
        # operands cast to f32 at DEFAULT precision: the MXU still runs
        # one bf16 pass, and both tap weights and the bf16-cast inputs
        # are bf16-exact, so the products are bit-identical to bf16
        # operands — while keeping every conv dtype f32 so the AD
        # transpose is well-typed (mixed bf16-in/f32-out convs fail
        # lax.conv_general_dilated's dtype check in the backward pass).
        yh = _lax2.conv_general_dilated(
            yp.astype(jnp.float32),
            jnp.asarray(Kh),
            window_strides=(1, 1),
            padding=((pl, pr), (0, 0)),
            lhs_dilation=(s, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    else:
        # parity path: the fp32 interpolation einsum (Precision.HIGHEST),
        # bitwise-comparable with resize_bilinear's H contraction
        y = x.astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST
        ah = jnp.asarray(_interp_matrix(h, s * h, False))
        yh = jnp.einsum(
            "ph,nhwc->npwc",
            ah.astype(y.dtype),
            y,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    # yh is fp32 here in both paths, exactly as between resize_bilinear's
    # two einsums; the W-tap conv is the second contraction.
    #
    # Forms whose folded width exceeds the input width ((4,2): out W' =
    # 2w) are computed in the WIDEST tap form ((4,s') with s'=s, a plain
    # stride-1 T=3 conv emitting all s phases as channel groups) and then
    # W-split by a free reshape (N,sH,w,s*C) -> (N,sH,sw/f,f*C). The
    # direct lhs_dilation=2 kernel is mathematically identical but
    # lowers as a transposed conv whose output XLA lays out T(2,128),
    # poisoning every downstream folded elementwise with relayout copies
    # (measured +0.4 ms/step at batch 1, docs/DESIGN.md round 5).
    fw = max(f, s)
    Knp, stride, ld, pr = _wfold_up_kernel(c, fw, s)
    assert ld == 1, (s, fw)  # no lhs_dilation form is ever used now
    K = jnp.asarray(Knp).astype(yh.dtype)
    y = jnp.pad(yh, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    y = _lax.conv_general_dilated(
        y,
        K,
        window_strides=(1, stride),
        padding=((0, 0), (0, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if fw != f:
        n_, h_, w_, c_ = y.shape
        y = y.reshape(n_, h_, w_ * (fw // f), c_ // (fw // f))
    if dtype != jnp.bfloat16:
        # The interpolation operator CLAMPS the source index at the s//2
        # boundary columns per side (net weight 1.0 on the edge pixel);
        # the periodic taps split that weight and re-sum it, off by 1 ulp
        # in fp32 (exact in the bf16 path: f32 accumulation then one
        # rounding). Overwrite for bitwise resize_bilinear parity there.
        cb = s // 2
        y = y.at[:, :, 0:1, 0 : cb * c].set(
            jnp.tile(yh[:, :, 0:1, :], (1, 1, 1, cb))
        )
        y = y.at[:, :, -1:, (f - cb) * c :].set(
            jnp.tile(yh[:, :, -1:, :], (1, 1, 1, cb))
        )
    return y.astype(dtype)


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool
) -> jnp.ndarray:
    """Bilinearly resize NHWC `x` to `out_hw`, exact torch parity.

    Interpolation always happens in fp32 regardless of input dtype; the
    result is cast back to the input dtype.
    """
    n, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    ah = jnp.asarray(_interp_matrix(h, oh, align_corners))
    aw = jnp.asarray(_interp_matrix(w, ow, align_corners))
    if dtype == jnp.bfloat16:
        # speed path: bf16 operands at native MXU precision with fp32
        # accumulation (interpolation weights are exact in bf16 only for
        # power-of-two ratios; error is below bf16 activation noise)
        y = x
        precision = None
    else:
        # parity path: fp32 math at HIGHEST precision — TPU's default
        # matmul precision is bf16-decomposed, which would break logit
        # parity with the reference.
        y = x.astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST
    # contract H: (oh,h) x (n,h,w,c) -> (n,oh,w,c)
    y = jnp.einsum(
        "ph,nhwc->npwc",
        ah.astype(y.dtype),
        y,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # contract W: (ow,w) x (n,oh,w,c) -> (n,oh,ow,c)
    y = jnp.einsum(
        "qw,npwc->npqc",
        aw.astype(y.dtype),
        y,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return y.astype(dtype)
