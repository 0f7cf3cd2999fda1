"""W-axis channel folding: full-lane convolutions for narrow-channel stages.

PIDNet's P/D branches run entire stages at 1/8 resolution with 32-64
channels (reference models/pidnet.py:136-176). On TPU the channel dim
maps to the 128-wide lane axis, so those convs fill 25-50% of the MXU —
measured on v5e, a 3x3 C64 conv pair runs at ~37% of its compute floor
and a C32 pair at ~12-20% (scripts/conv_floor.py).

The fix: fold W-parity into channels. For NHWC, `space-to-depth along W
only` is a FREE reshape — (N,H,W,C) -> (N,H,W/f,f*C) touches no bytes —
and picking f = 128/C restores full lanes. A stride-1 3x3 conv then maps
to a (3,2)- or (3,3)-tap conv over folded blocks:

* pair form (basic blocks, two 3x3s): conv1 writes a MID layout where
  output group b of block J holds column y[f*(J-1)+b+1] — chosen so every
  tap of both convs lands in a 2-block window. Cost is 6 taps over f*C
  channels at W/f positions = 4/3 of the original MACs (vs 2x for the
  naive canonical->canonical T=3 form), at ~93% of the compute floor.
  conv2 maps the mid layout back to canonical. The mid layout carries f
  out-of-range garbage columns (y[1-f..0] at block 0, y[W] at block B)
  that must be ZEROED (`mid_mask`) before anything consumes them —
  before BN statistics, and again after BN/ReLU re-bias them.
* single form (bottleneck 3x3s): canonical->canonical with a 3-block
  window (T=3), f x the MACs — still a win for C<=64 — and exact SAME-
  padding semantics with no masking.
* 1x1 convs are block-diagonal in folded space (MAC-neutral).

Measured (v5e, batch 8 @1024^2, fwd): C64 basic-block pair 263us -> 144us
(1.8x); C32 pair 232us -> 72us (3.2x). Verified bit-exact vs the
unfolded convs in fp32.

Expansions are one-hot einsums over the canonical weights (the same
treatment as ops/space_to_depth.s2d_axis_factor), so the train step
differentiates straight through to the torch-named parameters and
checkpoints are layout-free.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

# einsum for expanding a canonical (kh,kw,C,O) kernel with a W-axis
# one-hot factor E (T, f_in, f_out, kw): -> (kh, T, f_in*C, f_out*O)
EXPAND_EQ = "QbBk,hkco->hQbcBo"


def wfold(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(N,H,W,C) -> (N,H,W/f,f*C); folded channel index = (w%f, c).
    A pure reshape: NHWC memory order makes W-only s2d free."""
    n, h, w, c = x.shape
    assert w % f == 0, (w, f)
    return x.reshape(n, h, w // f, f * c)


def wunfold(x: jnp.ndarray, f: int) -> jnp.ndarray:
    n, h, b, fc = x.shape
    return x.reshape(n, h, b * f, fc // f)


@lru_cache(maxsize=None)
def pair1_factor(f: int) -> np.ndarray:
    """canonical -> mid. Output group bO of block J holds y[f(J-1)+bO+1];
    input group bI of window block J-1+Q holds x[f(J-1+Q)+bI]. The conv
    runs pad_w=(1,1) producing B+1 blocks. tap dj = f*Q + bI - bO - 1."""
    E = np.zeros((2, f, f, 3), np.float32)
    for Q in range(2):
        for bI in range(f):
            for bO in range(f):
                dj = f * Q + bI - bO - 1
                if -1 <= dj <= 1:
                    E[Q, bI, bO, dj + 1] = 1.0
    return E


@lru_cache(maxsize=None)
def pair2_factor(f: int) -> np.ndarray:
    """mid -> canonical. Input group bI of window block j+Q holds
    y[f(j+Q-1)+bI+1]; output group bO of block j holds y'[f*j+bO]. The
    conv runs pad_w=(0,0) on the B+1-block mid, producing B blocks.
    tap dj = f*(Q-1) + bI + 1 - bO."""
    E = np.zeros((2, f, f, 3), np.float32)
    for Q in range(2):
        for bI in range(f):
            for bO in range(f):
                dj = f * (Q - 1) + bI + 1 - bO
                if -1 <= dj <= 1:
                    E[Q, bI, bO, dj + 1] = 1.0
    return E


@lru_cache(maxsize=None)
def single_factor(f: int) -> np.ndarray:
    """canonical -> canonical (T=3 window, pad_w=(1,1)): exact SAME
    padding, no mask, f x MACs. tap dj = f*(Q-1) + bI - bO."""
    E = np.zeros((3, f, f, 3), np.float32)
    for Q in range(3):
        for bI in range(f):
            for bO in range(f):
                dj = f * (Q - 1) + bI - bO
                if -1 <= dj <= 1:
                    E[Q, bI, bO, dj + 1] = 1.0
    return E


@lru_cache(maxsize=None)
def eye_factor(f: int) -> np.ndarray:
    """1x1 convs: block-diagonal (T=1, tap kw=0 of a 1-wide kernel)."""
    E = np.zeros((1, f, f, 1), np.float32)
    for b in range(f):
        E[0, b, b, 0] = 1.0
    return E


def expand_weight(w, E) -> jnp.ndarray:
    """(kh,kw,C,O) canonical kernel -> (kh,T,f*C,f*O) folded kernel.
    Differentiable: the einsum transpose scatter-adds cotangents back
    onto the canonical weight."""
    T, fi, fo, kw = E.shape
    kh, kw_w, c, o = w.shape
    assert kw_w == kw, (w.shape, E.shape)
    K = jnp.einsum(EXPAND_EQ, jnp.asarray(E, w.dtype), w)
    return K.reshape(kh, T, fi * c, fo * o)


@lru_cache(maxsize=None)
def mid_mask(blocks_out: int, f: int, o: int) -> np.ndarray:
    """(1,1,B+1,f*O) multiplicative mask zeroing the mid layout's
    out-of-range columns. Block J group b holds y[f(J-1)+b+1], so block 0
    groups 0..f-2 hold y[<0] and block B group f-1 holds y[W] — both
    outside the image. conv1 fills them with out-of-range conv values
    (its taps read real pixels there); conv2's expansion assumes they are
    the zeros the original conv's SAME padding would supply."""
    m = np.ones((1, 1, blocks_out, f, o), np.float32)
    m[:, :, 0, : f - 1] = 0.0
    m[:, :, blocks_out - 1, f - 1] = 0.0
    return m.reshape(1, 1, blocks_out, f * o)


def fold_factor(planes: int, w_blocks: int) -> int | None:
    """Pick the fold factor for a stage working at `planes` channels on a
    1/8-res tensor with `w_blocks` columns, or None when folding is not
    worthwhile/possible. f = 128/planes caps at 4 (beyond that the f x MAC
    growth of the single form outpaces the lane-fill win)."""
    if planes >= 128:
        return None
    f = max(1, min(4, 128 // planes))
    if f < 2 or w_blocks % f or w_blocks // f < 2:
        return None
    return f
