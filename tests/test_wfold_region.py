"""Stay-folded region (`wfold_region`): exact equivalence vs the default
per-stage fold/unfold path.

Round 4 shipped this wiring unmeasured and untested; round 5 re-lands it
flag-gated with the equivalence pinned here: for every variant and mode
(eval fp32 / folded-bf16 argmax / train), the region path must match the
default path on the SAME weights — the only numeric difference allowed
is resize_wfold's 1-2 fp32 ulp vs resize_bilinear (oracle-tested in
tests/test_resize_wfold.py), amplified through a handful of convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pidnet_tpu.models import pidnet as M

HW = (64, 128)  # h8=8, w8=16: smallest grid the region engages on


def _x(rng, n=2):
    return jnp.asarray(rng.standard_normal((n, *HW, 3)), jnp.float32)


@pytest.mark.parametrize("name", ["pidnet_s", "pidnet_m", "pidnet_l"])
@pytest.mark.parametrize("region", [True, "p", "d"])
def test_eval_fp32_equivalence(rng, name, region):
    spec = M.spec_for(name, 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    x = _x(rng)
    base = M.apply(params, state, x, spec, train=False, wfold=True)
    got = M.apply(
        params, state, x, spec, train=False, wfold=True, wfold_region=region
    )
    for b, g in zip(base, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_train_mode_equivalence(rng):
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    x = _x(rng)
    base, st_b = M.apply(params, state, x, spec, train=True, wfold=True)
    got, st_g = M.apply(
        params, state, x, spec, train=True, wfold=True, wfold_region=True
    )
    for b, g in zip(base, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=2e-4, atol=2e-4)
    assert st_b.keys() == st_g.keys()
    for k in st_b:
        np.testing.assert_allclose(
            np.asarray(st_g[k]), np.asarray(st_b[k]), rtol=2e-4, atol=2e-4
        )


def test_folded_bf16_argmax_equivalence(rng):
    from pidnet_tpu.convert import fold_params

    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    folded = fold_params(params, state, spec)
    x = _x(rng, n=1)
    kw = dict(folded=True, compute_dtype=jnp.bfloat16, stem_s2d=True, wfold=True)
    base = M.apply(folded, {}, x.astype(jnp.bfloat16), spec, **kw)
    got = M.apply(
        folded, {}, x.astype(jnp.bfloat16), spec, wfold_region=True, **kw
    )
    b = np.asarray(base.astype(jnp.float32))
    g = np.asarray(got.astype(jnp.float32))
    agree = (b.argmax(-1) == g.argmax(-1)).mean()
    assert agree >= 0.995, agree


def test_region_inert_without_wfold(rng):
    # wfold_region only engages on top of wfold=True; without it the flag
    # must be a bitwise no-op. (The h8/w8 % 4 guards are unreachable for
    # legal inputs — H/W must be multiples of 64, so h8/w8 are multiples
    # of 8 — but stay as defense for future grids.)
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    x = _x(rng, n=1)
    base = M.apply(params, state, x, spec, train=False, wfold=False)
    got = M.apply(params, state, x, spec, train=False, wfold=False, wfold_region=True)
    for b, g in zip(base, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(b))
