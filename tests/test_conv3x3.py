"""Hand Pallas 3x3 conv (ops/conv3x3.py) vs the XLA lowering.

Runs the Mosaic interpreter on CPU (tests/conftest.py forces the CPU
backend); scripts/conv_ab.py times the same kernel against XLA's conv
on the real chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pidnet_tpu.ops.conv3x3 import conv3x3


def _ref(x, w, b=None, relu=False):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize(
    "n,h,w,c,tile_h",
    [
        (2, 32, 32, 128, 8),   # wfold P/D stage shape (scaled down)
        (1, 16, 16, 256, 16),  # layer4-like
    ],
)
def test_conv3x3_matches_xla(rng, n, h, w, c, tile_h):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y, st = conv3x3(x, wt, b, relu=True, stats=True, tile_h=tile_h)

    ref = _ref(x, wt, b, relu=True)
    # f32 accumulation in both, but different tap/summation order — allow
    # one bf16 ulp at the activations' ~unit magnitude
    np.testing.assert_allclose(
        np.asarray(y, np.float32),
        np.asarray(ref.astype(jnp.bfloat16), np.float32),
        atol=0.0079,
        rtol=0.01,
    )
    # BN statistics: f32 sums of the post-epilogue activation
    sref = jnp.stack([jnp.sum(ref, (0, 1, 2)), jnp.sum(ref * ref, (0, 1, 2))])
    np.testing.assert_allclose(np.asarray(st), np.asarray(sref), rtol=2e-5)


def test_conv3x3_plain_no_epilogue(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 128)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.02, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = conv3x3(x, wt, tile_h=8)
    ref = _ref(x, wt).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=0.0079, rtol=0.01,
    )
