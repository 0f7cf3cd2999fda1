"""W-folded convolution layout (ops/wfold.py + models.pidnet._wf_*).

The fold re-indexes stride-1 3x3/1x1 convs over W-parity channel groups
(free NHWC reshape) so 32-64 channel stages fill the TPU's 128 lanes.
The math must be EXACT: these tests pin the kernel expansions against
the plain convs in fp32 (HIGHEST precision), and the whole-model path
against the unfolded apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pidnet_tpu.models import pidnet as M
from pidnet_tpu.nn.functional import batch_norm_grouped, batch_norm_train, conv2d
from pidnet_tpu.ops.wfold import (
    expand_weight,
    eye_factor,
    fold_factor,
    mid_mask,
    pair1_factor,
    pair2_factor,
    single_factor,
    wfold,
    wunfold,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _conv(x, w, pad_w=(1, 1)):
    ph = (w.shape[0] // 2,) * 2
    return conv2d(jnp.asarray(x), jnp.asarray(w), padding=(ph, pad_w))


@pytest.mark.parametrize("f,c,o", [(2, 8, 8), (4, 4, 6), (2, 6, 10)])
def test_pair_exact(rng, f, c, o):
    """conv1(pair) -> mask -> conv2(pair) == two SAME 3x3 convs, exactly."""
    n, h, w = 2, 12, 8 * f
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, c, o)) * 0.3).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, o, c)) * 0.3).astype(np.float32)
    want = _conv(_conv(x, w1), w2)

    b = w // f
    xf = wfold(jnp.asarray(x), f)
    mid = _conv(xf, expand_weight(jnp.asarray(w1), pair1_factor(f)), (1, 1))
    mid = mid * jnp.asarray(mid_mask(b + 1, f, o))
    got = _conv(mid, expand_weight(jnp.asarray(w2), pair2_factor(f)), (0, 0))
    np.testing.assert_array_equal(np.asarray(wunfold(got, f)), np.asarray(want))


@pytest.mark.parametrize("f", [2, 4])
def test_single_exact(rng, f):
    """The canonical->canonical (T=3) form: one 3x3, no masking."""
    n, h, w, c, o = 2, 10, 4 * f, 5, 7
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    k = (rng.standard_normal((3, 3, c, o)) * 0.3).astype(np.float32)
    want = _conv(x, k)
    got = _conv(wfold(jnp.asarray(x), f), expand_weight(jnp.asarray(k), single_factor(f)), (1, 1))
    np.testing.assert_array_equal(np.asarray(wunfold(got, f)), np.asarray(want))


def test_eye_exact(rng):
    """1x1 convs are block-diagonal in folded space."""
    f, n, h, w, c, o = 4, 2, 6, 16, 6, 9
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    k = rng.standard_normal((1, 1, c, o)).astype(np.float32)
    want = _conv(x, k, (0, 0))
    got = _conv(wfold(jnp.asarray(x), f), expand_weight(jnp.asarray(k), eye_factor(f)), (0, 0))
    # the folded contraction sums 3f-1 extra zero products -> one ulp-level
    # reassociation difference on CPU oneDNN
    np.testing.assert_allclose(
        np.asarray(wunfold(got, f)), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_grouped_bn_count_scale(rng):
    """BN statistics on the mid layout (B+1 blocks, garbage zeroed) must
    equal the unfolded BN statistics exactly — count_scale corrects the
    denominator for the f known-zero slots."""
    f, n, h, w, o = 2, 3, 6, 16, 5
    b = w // f
    x = rng.standard_normal((n, h, w, o)).astype(np.float32)
    k = (rng.standard_normal((3, 3, o, o)) * 0.3).astype(np.float32)
    gamma = (1 + rng.random(o)).astype(np.float32)
    beta = rng.standard_normal(o).astype(np.float32)
    rm = rng.standard_normal(o).astype(np.float32)
    rv = (1 + rng.random(o)).astype(np.float32)

    y_ref = _conv(x, k)
    _, nm_ref, nv_ref = batch_norm_train(
        y_ref, jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(rm), jnp.asarray(rv)
    )

    mid = _conv(wfold(jnp.asarray(x), f), expand_weight(jnp.asarray(k), pair1_factor(f)), (1, 1))
    mid = mid * jnp.asarray(mid_mask(b + 1, f, o))
    _, nm, nv = batch_norm_grouped(
        mid, jnp.asarray(gamma), jnp.asarray(beta), jnp.asarray(rm), jnp.asarray(rv),
        groups=f, train=True, count_scale=b / (b + 1),
    )
    np.testing.assert_allclose(np.asarray(nm), np.asarray(nm_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_ref), rtol=1e-5, atol=1e-6)


def test_fold_factor_gating():
    assert fold_factor(64, 128) == 2
    assert fold_factor(32, 128) == 4
    assert fold_factor(128, 128) is None  # full lanes already
    assert fold_factor(64, 15) is None  # odd width
    assert fold_factor(32, 4) is None  # too few blocks after folding
    assert fold_factor(64, 4) == 2


@pytest.mark.parametrize("arch", ["pidnet_s", "pidnet_m"])
def test_apply_wfold_matches_unfolded(rng, arch):
    """Whole-model: wfold=True == wfold=False (eval and train modes).
    Differences are fp reassociation only (CPU oneDNN convs are themselves
    run-to-run nondeterministic; margins per axon-tpu-env-quirks)."""
    spec = M.spec_for(arch, 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((2, 64, 128, 3)), jnp.float32)

    outs_a = M.apply(params, state, x, spec)
    outs_b = M.apply(params, state, x, spec, wfold=True)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3)

    (outs_ta, st_a) = M.apply(params, state, x, spec, train=True)
    (outs_tb, st_b) = M.apply(params, state, x, spec, train=True, wfold=True)
    for a, b in zip(outs_ta, outs_tb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3)
    for key in st_a:
        np.testing.assert_allclose(
            np.asarray(st_a[key]), np.asarray(st_b[key]), rtol=1e-3, atol=1e-4,
            err_msg=key,
        )


def test_apply_wfold_gradients_match(rng):
    """Gradients w.r.t. every parameter agree between the folded and
    unfolded programs (the expansions are linear in the weights, so the
    einsum transpose must scatter cotangents back exactly)."""
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(1), spec)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)

    def loss(p, wf):
        outs, _ = M.apply(p, state, x, spec, train=True, wfold=wf)
        # smooth reduction: |.| would put a kink at every near-zero logit,
        # where fp-reassociation-level forward differences flip the
        # cotangent sign and swamp the comparison
        return sum(jnp.mean(jnp.square(o.astype(jnp.float32))) for o in outs)

    g_a = jax.grad(lambda p: loss(p, False))(params)
    g_b = jax.grad(lambda p: loss(p, True))(params)
    worst = 0.0
    for key in g_a:
        a, b = np.asarray(g_a[key]), np.asarray(g_b[key])
        # floor the scale at 1: the stem conv biases are EXACTLY cancelled
        # by their following BN, so their true gradient is ~0 and any fp
        # reassociation shows at 100% relative scale — absolute diffs
        # below ~1e-2 there are noise, not disagreement
        denom = np.maximum(np.abs(a).max(), 1.0)
        worst = max(worst, float(np.abs(a - b).max() / denom))
    assert worst < 2e-2, worst
