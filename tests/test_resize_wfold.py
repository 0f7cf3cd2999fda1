"""resize_wfold: brute-force oracle vs wfold(resize_bilinear(...)).

The hand-built tap tables (ops/resize.py:_WFOLD_UP_FORMS — s=4 phases,
lhs_dilation tricks) are exactly the kind of code that needs an
exhaustive oracle: every (scale, fold) in {2,4}x{2,4}, several widths,
fp32 bitwise (docstring promises resize_bilinear parity up to the edge
overwrite) and bf16 bitwise (one f32 accumulation, one rounding in both
paths). VERDICT r4 weak #3."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from pidnet_tpu.ops.resize import resize_bilinear, resize_wfold
from pidnet_tpu.ops.wfold import wfold

CASES = [
    (s, f, h, w, c)
    for (s, f), (h, w), c in itertools.product(
        [(2, 2), (2, 4), (4, 2), (4, 4)], [(4, 8), (6, 10), (8, 32)], [3, 8]
    )
    if (s * w) % f == 0 and (s * w) // f >= 2
]


@pytest.mark.parametrize("s,f,h,w,c", CASES)
def test_fp32_matches_oracle(rng, s, f, h, w, c):
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    got = np.asarray(resize_wfold(x, f, s))
    want = np.asarray(wfold(resize_bilinear(x, (s * h, s * w), False), f))
    assert got.shape == want.shape
    # fp32: bitwise except possibly 1-2 ulp from FMA order differences
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=3e-7)
    # the clamped boundary columns are overwritten for exact parity
    cb = s // 2
    assert (got[:, :, 0:1, : cb * c] == want[:, :, 0:1, : cb * c]).all()
    assert (got[:, :, -1:, (f - cb) * c :] == want[:, :, -1:, (f - cb) * c :]).all()


@pytest.mark.parametrize("s,f,h,w,c", CASES)
def test_bf16_bitwise(rng, s, f, h, w, c):
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.bfloat16)
    got = np.asarray(resize_wfold(x, f, s).astype(jnp.float32))
    want = np.asarray(
        wfold(resize_bilinear(x, (s * h, s * w), False), f).astype(jnp.float32)
    )
    assert (got == want).all()


def test_model_shapes_roundtrip(rng):
    # the shapes the stay-folded region actually feeds it: 1/16 partner
    # up 2x and 1/32 partner up 4x into f=2 folded 1/8 space
    for s, hw in [(2, (64, 128)), (4, (32, 64))]:
        x = jnp.asarray(rng.standard_normal((1, *hw, 32)), jnp.float32)
        y = resize_wfold(x, 2, s)
        assert y.shape == (1, s * hw[0], s * hw[1] // 2, 64)
