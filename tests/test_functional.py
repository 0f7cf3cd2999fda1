"""Unit tests for nn.functional batch-norm statistics, including the
mask-weighted form behind the sublane batch padding (train/step.py
pad_batch): weight-0 samples must contribute NOTHING, so masked stats
over a padded batch equal plain stats over the unpadded batch.
"""

import numpy as np

import jax.numpy as jnp

from pidnet_tpu.nn.functional import (
    batch_norm_grouped,
    batch_norm_train,
)


def _data(rng, n=8, h=4, w=4, c=16):
    x = rng.standard_normal((n, h, w, c)).astype(np.float32) * 2.0 + 0.5
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    rm = rng.standard_normal(c).astype(np.float32)
    rv = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
    return (jnp.asarray(a) for a in (x, gamma, beta, rm, rv))


def test_masked_bn_ignores_padding(rng):
    """Weighted stats over [6 real + 2 garbage] == plain stats over the 6
    real samples; normalization of the real rows matches too."""
    x, gamma, beta, rm, rv = _data(rng)
    x_pad = jnp.concatenate([x[:6], 1e6 * jnp.ones_like(x[:2])])  # garbage pad
    w = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    y_ref, nm_ref, nv_ref = batch_norm_train(x[:6], gamma, beta, rm, rv)
    y_pad, nm_pad, nv_pad = batch_norm_train(
        x_pad, gamma, beta, rm, rv, sample_weight=w
    )
    np.testing.assert_allclose(nm_pad, nm_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nv_pad, nv_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_pad[:6], y_ref, rtol=1e-4, atol=1e-4)


def test_masked_bn_full_weights_equals_plain(rng):
    """sample_weight of all ones is the identity configuration (the
    weighted sum/cnt expression vs jnp.mean differ only at fp epsilon)."""
    x, gamma, beta, rm, rv = _data(rng)
    ones = jnp.ones((x.shape[0],), jnp.float32)
    y0, nm0, nv0 = batch_norm_train(x, gamma, beta, rm, rv)
    y1, nm1, nv1 = batch_norm_train(x, gamma, beta, rm, rv, sample_weight=ones)
    np.testing.assert_allclose(nm1, nm0, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(nv1, nv0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)


def test_masked_grouped_bn_ignores_padding(rng):
    """Same property for the s2d grouped-BN path (stem_front_live)."""
    rng2 = np.random.default_rng(3)
    c_orig, groups = 8, 4
    x = rng2.standard_normal((8, 4, 4, c_orig * groups)).astype(np.float32)
    gamma = jnp.asarray(rng2.standard_normal(c_orig), jnp.float32)
    beta = jnp.asarray(rng2.standard_normal(c_orig), jnp.float32)
    rm = jnp.zeros(c_orig, jnp.float32)
    rv = jnp.ones(c_orig, jnp.float32)
    x_pad = jnp.concatenate(
        [jnp.asarray(x[:6]), -1e6 * jnp.ones_like(jnp.asarray(x[:2]))]
    )
    w = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    y_ref, nm_ref, nv_ref = batch_norm_grouped(
        jnp.asarray(x[:6]), gamma, beta, rm, rv, groups=groups, train=True
    )
    y_pad, nm_pad, nv_pad = batch_norm_grouped(
        x_pad, gamma, beta, rm, rv, groups=groups, train=True, sample_weight=w
    )
    np.testing.assert_allclose(nm_pad, nm_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(nv_pad, nv_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_pad[:6], y_ref, rtol=1e-4, atol=1e-4)
