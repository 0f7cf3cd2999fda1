"""Fused loss-front kernel (ops/ce_front.py): forward + gradient parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pidnet_tpu.ops.ce_front import _xla_ce_maps, ce_maps


@pytest.fixture()
def case(rng):
    N, h, w, C, OH, OW = 2, 16, 16, 19, 128, 128
    logits = (rng.standard_normal((N, h, w, C)) * 2).astype(np.float32)
    labels = rng.integers(0, 21, (N, OH, OW)).astype(np.int32)
    labels = np.where(labels >= 19, 255, labels)  # some ignore pixels
    cw = (0.8 + rng.random(C)).astype(np.float32)
    return logits, labels, cw, (OH, OW)


def test_forward_matches_xla(case):
    logits, labels, cw, out_hw = case
    nll_p, w_p = ce_maps(
        jnp.asarray(logits, jnp.bfloat16), labels, cw, 255, out_hw, True,
        interpret=True,
    )
    nll_x, w_x = _xla_ce_maps(
        jnp.asarray(logits), jnp.asarray(labels), cw, 255, out_hw, True
    )
    nll_p, w_p, nll_x, w_x = map(np.asarray, (nll_p, w_p, nll_x, w_x))
    # weight map is label-driven: exact
    np.testing.assert_allclose(w_p, w_x, atol=1e-6)
    # ignored pixels are exactly inert
    assert nll_p[labels == 255].max() == 0 == w_p[labels == 255].max()
    # nll within bf16 interpolation noise of the fp32 XLA path
    np.testing.assert_allclose(nll_p, nll_x, rtol=0.05, atol=0.05)


def test_gradient_matches_xla(case):
    logits, labels, cw, out_hw = case

    def loss_pallas(l):
        n_, w_ = ce_maps(l, labels, cw, 255, out_hw, True, interpret=True)
        return jnp.sum(n_ * w_) / jnp.sum(w_)

    def loss_xla(l):
        n_, w_ = _xla_ce_maps(l, jnp.asarray(labels), cw, 255, out_hw, True)
        return jnp.sum(n_ * w_) / jnp.sum(w_)

    lb = jnp.asarray(logits, jnp.bfloat16)
    assert np.isclose(float(loss_pallas(lb)), float(loss_xla(jnp.asarray(logits))), rtol=1e-3)
    gp = np.asarray(jax.grad(loss_pallas)(lb)).astype(np.float32)
    gx = np.asarray(jax.grad(loss_xla)(jnp.asarray(logits)))
    cos = float((gp * gx).sum() / np.sqrt((gp**2).sum() * (gx**2).sum()))
    assert cos > 0.9999, cos
    assert np.abs(gp - gx).max() <= 0.02 * np.abs(gx).max()


def test_fallback_paths(case):
    """fp32 logits, align_corners=False, and same-size logits all take the
    exact XLA route (no Pallas requirements)."""
    logits, labels, cw, out_hw = case
    # fp32 -> XLA path regardless of interpret flag
    a = ce_maps(jnp.asarray(logits), labels, cw, 255, out_hw, True)
    b = _xla_ce_maps(jnp.asarray(logits), jnp.asarray(labels), cw, 255, out_hw, True)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # class_weights=None means unit weights
    nll, w = ce_maps(jnp.asarray(logits), labels, None, 255, out_hw, True)
    w = np.asarray(w)
    assert set(np.unique(w)) <= {0.0, 1.0}
