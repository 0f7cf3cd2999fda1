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
