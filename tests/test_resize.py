"""Bilinear-resize parity vs torch F.interpolate (both align_corners modes).

This is hard-part #1 from SURVEY.md §7: the reference mixes align_corners
semantics (models/pidnet.py:13 vs configs/default.py:32 vs tools/custom.py:93)
and logit parity requires matching both exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pidnet_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((16, 32), (128, 256)),   # 1/64 -> 1/8 (spp output upsample)
        ((32, 64), (128, 256)),   # 1/32 -> 1/8 (diff4 / pag4)
        ((64, 128), (128, 256)),  # 1/16 -> 1/8 (diff3 / pag3)
        ((128, 256), (1024, 2048)),  # logits -> label size
        ((7, 13), (64, 96)),      # non-integer factors
        ((1, 1), (16, 16)),       # global-pool branch upsample
        ((33, 65), (17, 31)),     # downsample
        ((8, 8), (8, 8)),         # identity
    ],
)
def test_matches_torch(align_corners, in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(
        xt, size=out_hw, mode="bilinear", align_corners=align_corners
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_torch_fuzz(rng):
    """Randomized size sweep (both modes) — guards the source-index math
    (ops/resize._interp_matrix) against edge cases the fixed list misses."""
    for i in range(25):
        ih, iw = (int(v) for v in rng.integers(1, 70, 2))
        oh, ow = (int(v) for v in rng.integers(1, 100, 2))
        align = bool(i % 2)
        x = rng.standard_normal((1, ih, iw, 3), dtype=np.float32)
        got = np.asarray(resize_bilinear(x, (oh, ow), align))
        want = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                size=(oh, ow),
                mode="bilinear",
                align_corners=align,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-5,
            err_msg=f"({ih},{iw})->({oh},{ow}) align={align}",
        )


def test_bf16_passthrough(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32), jnp.bfloat16)
    y = resize_bilinear(x, (16, 16), False)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (1, 16, 16, 3)
