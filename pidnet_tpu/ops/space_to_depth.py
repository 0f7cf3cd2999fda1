"""Space-to-depth stem transform (TPU MXU optimization).

The reference stem (models/pidnet.py:24-31) is two 3x3 stride-2 convs at
full/half resolution with 3 and 32 input channels. Those channel counts
fill 2-25% of the 128-lane MXU, and profiling shows the stem plus its
layout copies cost ~45% of the whole PIDNet-S inference step.

The fix (the MLPerf-ResNet space-to-depth trick, generalized): run the
stem in space-to-depth space, where every tensor keeps >=128 channels:

    raw (N,1024,2048,3)
      -> s2d8                          (N,128,256,192)     [free: ~14 us]
      -> conv 2x2 K1 (192->16*planes)  (N,128,256,512)     [= s2d4 of conv1.0 out]
      -> relu
      -> conv 2x2 K2 (512->4*planes)   (N,128,256,128)     [= s2d2 of conv1.3 out]
      -> d2s2                          (N,256,512,planes)

K1/K2 are the original 3x3 kernels re-indexed over s2d blocks (zero taps
outside the receptive field); the math is IDENTICAL to the reference stem
(verified to 1e-8 in fp32). MACs grow ~4-7x on the stem but wall time
drops ~6x (2.50 ms -> 0.39 ms measured on v5e at 2048x1024).

Derivation of the kernel re-indexing, for a 3x3 stride-2 conv consuming
s2d(in_block) input and producing s2d(out_block) output (out_block =
in_block/2): output block-row P in {0,1} relative to (p-1), in-offset aI,
out-offset aO:  raw tap di = in_block*(P-1) + aI - 2*aO, kept iff
di in [-1,1]. Padding ((1,0),(1,0)) supplies the p-1 block at the border,
matching the original conv's zero padding of 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H/b,W/b,b*b*C); channel index = (a*b + b_col)*C + c."""
    n, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, block * block * c)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    n, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(n, h, w, block, block, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c_out)


def stem_view(x):
    """Free W-only s2d view of an NHWC image batch: (N,H,W,C) -> (N,H,W/8,8C).

    A row-major reshape — on host numpy it is a zero-copy view. Feeding the
    folded `stem_s2d` pipeline its input in this form (instead of (N,H,W,3))
    removes the in-graph relayout XLA otherwise inserts to make the same
    reshape a bitcast: no layout of the raw (N,H,W,3) shape is simultaneously
    reshape-free and conv-ready, because the target layout would have to
    split the W dimension (measured 0.92 ms/step at batch 8 @1024x2048,
    scripts/layout_probe.py). `models.pidnet.stem_front` accepts either form.
    """
    n, h, w, c = x.shape
    assert w % 8 == 0, (w,)
    return x.reshape(n, h, w // 8, 8 * c)


def s2d_conv_weight(w, in_block: int, stride: int = 2):
    """Re-index a kxk (k in {1,3}) stride-`stride` conv kernel (k,k,C,O)
    into an equivalent conv over s2d(in_block) input producing
    s2d(in_block//stride) output.

    Returns (K, padding) where K has shape
    (T, T, in_block^2*C, out_block^2*O) and `padding` is the 2-D conv
    padding that reproduces the original conv's zero padding of k//2.

    Derivation: original output row r = p*out_block + aO needs input row
    stride*r + di = in_block*p + stride*aO + di (di in [-(k//2), k//2]);
    in s2d-in coordinates that is block p + t, offset aI with
    t = floor((stride*aO + di)/in_block), aI = (stride*aO+di) mod in_block.
    """
    w = np.asarray(w, np.float32)
    k, kw_, c, o = w.shape
    assert k == kw_ and k in (1, 3) and in_block % stride == 0
    out_block = in_block // stride
    lo, hi = -(k // 2), k // 2
    t_lo = -1 if lo < 0 else 0
    t_hi = (in_block - stride + hi) // in_block
    T = t_hi - t_lo + 1
    K = np.zeros((T, T, in_block, in_block, c, out_block, out_block, o), np.float32)
    for P in range(T):
        for aI in range(in_block):
            for aO in range(out_block):
                di = in_block * (t_lo + P) + aI - stride * aO
                if not lo <= di <= hi:
                    continue
                for Q in range(T):
                    for bI in range(in_block):
                        for bO in range(out_block):
                            dj = in_block * (t_lo + Q) + bI - stride * bO
                            if not lo <= dj <= hi:
                                continue
                            K[P, Q, aI, bI, :, aO, bO, :] = w[di - lo, dj - lo]
    K = K.reshape(T, T, in_block * in_block * c, out_block * out_block * o)
    pad = (-t_lo, T - 1 + t_lo)  # top = -t_lo, top+bottom = T-1
    return K, (pad, pad)


def s2d_conv_bias(b, out_block: int) -> np.ndarray:
    """Tile a per-channel bias over the s2d output blocks."""
    return np.tile(np.asarray(b, np.float32), out_block * out_block)


def s2d_expander(builder, w_shape, *args) -> tuple[np.ndarray, np.ndarray]:
    """Derive (idx, mask) such that `w.reshape(-1)[idx] * mask` rebuilds the
    s2d-re-indexed kernel DIFFERENTIABLY inside a traced train step (the
    cotangent scatter-adds back onto the canonical 3x3/1x1 weights).

    Works for any of the numpy kernel builders in this module by probing
    them with 1-based element indices instead of weights (exact in fp32 up
    to 2^24 elements, far above any kernel here).

    NOTE: retained for reference/testing; the hot training path uses the
    einsum factorizations below instead — on TPU a static `take` of ~150k
    elements lowers to a serial custom gather (~1-2 ms each, ~17 ms/step
    total measured across the front's convs), while the factorized
    expansion is two micro-matmuls."""
    probe = (np.arange(np.prod(w_shape), dtype=np.float32) + 1).reshape(w_shape)
    K = builder(probe, *args)
    if isinstance(K, tuple):  # s2d_conv_weight returns (K, padding)
        K = K[0]
    K = np.asarray(K, np.float64)
    idx = (np.maximum(K, 1) - 1).astype(np.int32)
    mask = (K > 0).astype(np.float32)
    return idx, mask


def s2d_axis_factor(k: int, in_block: int, stride: int):
    """One-hot per-axis expansion factor for `s2d_conv_weight`.

    The re-indexing there is separable: K[P,Q,aI,bI,c,aO,bO,o] =
    w[di(P,aI,aO)-lo, dj(Q,bI,bO)-lo, c, o], so with
    E[P,aI,aO,ki] = 1 iff ki == di(P,aI,aO)-lo (valid), the expanded kernel
    is `einsum('PAak,QBbl,klco->PQABcabo', E, E, w)` — two tiny dense
    contractions instead of a serial gather, with the matmul-transpose
    gradient scatter-adding back onto the canonical weight for free.

    Returns (E of shape (T, in_block, out_block, k), padding)."""
    lo, hi = -(k // 2), k // 2
    t_lo = -1 if lo < 0 else 0
    t_hi = (in_block - stride + hi) // in_block
    T = t_hi - t_lo + 1
    out_block = in_block // stride
    E = np.zeros((T, in_block, out_block, k), np.float32)
    for P in range(T):
        for aI in range(in_block):
            for aO in range(out_block):
                di = in_block * (t_lo + P) + aI - stride * aO
                if lo <= di <= hi:
                    E[P, aI, aO, di - lo] = 1.0
    pad = (-t_lo, T - 1 + t_lo)
    return E, (pad, pad)


def s2d_stem_axis_factors():
    """One-hot factors for `s2d_stem_wide_weight` (separable the same way):
    K[kh,Q,b,c,a4,b4,o] = w[di+1, dj+1, c, o] with kh = 2*a4 + di + 1 and
    b = 8*(1-Q) + 2*b4 + dj. Expanded kernel =
    `einsum('hak,QBbl,klco->hQBcabo', E1, E2, w)`.

    Returns (E1 (9,4,3), E2 (2,8,4,3))."""
    E1 = np.zeros((9, 4, 3), np.float32)
    for a4 in range(4):
        for di in (-1, 0, 1):
            kh = 2 * a4 + di + 1
            if 0 <= kh <= 8:
                E1[kh, a4, di + 1] = 1.0
    E2 = np.zeros((2, 8, 4, 3), np.float32)
    for Q in (0, 1):
        for b4 in range(4):
            for dj in (-1, 0, 1):
                b = 8 * (1 - Q) + 2 * b4 + dj
                if 0 <= b <= 7:
                    E2[Q, b, b4, dj + 1] = 1.0
    return E1, E2


def s2d_stem_wide_weight(w) -> np.ndarray:
    """Transpose-free variant of the first stem conv.

    The raw NHWC image (N,H,W,3) viewed as (N, H, W/8, 24) is a FREE
    reshape (W-only space-to-depth). The original 3x3 stride-2 conv then
    becomes a (9,2) kernel with strides (8,1) producing the s2d4-layout
    output directly — the device-side s2d8 transpose (~0.6 ms at
    2048x1024) disappears entirely.

    Index map: output (p,q,(a4,b4,o)) is original out pixel
    (4p+a4, 4q+b4); it needs raw rows 8p+dh with dh = 2*a4+di and raw
    cols 8(q-1+Q)+b with b = 8(1-Q)+2*b4+dj, di/dj in [-1,1].
    Returns (9, 2, 8*C, 16*O)."""
    w = np.asarray(w, np.float32)
    k, k2, c, o = w.shape
    assert k == 3 and k2 == 3
    K = np.zeros((9, 2, 8, c, 4, 4, o), np.float32)
    for a4 in range(4):
        for di in (-1, 0, 1):
            kh = 2 * a4 + di + 1  # dh + 1 (pad top 1)
            if not 0 <= kh <= 8:
                continue
            for Q in (0, 1):
                for b4 in range(4):
                    for dj in (-1, 0, 1):
                        b = 8 * (1 - Q) + 2 * b4 + dj
                        if not 0 <= b <= 7:
                            continue
                        K[kh, Q, b, :, a4, b4, :] = w[di + 1, dj + 1]
    return K.reshape(9, 2, 8 * c, 16 * o)
