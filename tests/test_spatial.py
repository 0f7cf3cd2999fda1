"""Spatial partitioning (GSPMD H-dim sharding) — SURVEY §2.7's optional
sequence-parallel analogue: conv halo exchange, BN/pool/OHEM global
reductions all emitted by the SPMD partitioner, tested on the virtual
8-CPU mesh against the unsharded program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel.spatial import (
    make_mesh_2d,
    make_spatial_infer,
    make_spatial_train_step,
    put_batch,
)
from pidnet_tpu.train import TrainState


def _net(augment):
    spec = M.spec_for("pidnet_s", 19, augment=augment)
    params, state = M.init(jax.random.PRNGKey(7), spec)
    return spec, params, state


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_spatial_infer_matches_unsharded(rng, mesh_shape):
    # augment=False specs return ONE head array (N,h,w,C) — compare it as
    # a whole (round 2 accidentally zip-iterated the batch dimension here)
    spec, params, state = _net(augment=False)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)

    want = np.asarray(M.apply(params, state, jnp.asarray(x), spec, train=False))

    mesh = make_mesh_2d(*mesh_shape)
    fn = make_spatial_infer(spec, mesh)
    got = np.asarray(fn(params, state, put_batch(mesh, x)))

    assert got.shape == want.shape
    # The partitioner re-orders the reductions behind DAPPM global pooling
    # and the H-contracting resize matmuls (partial sums + psum), so fp32
    # logits differ by reduction-order noise; assert closeness plus
    # near-exact class decisions on the segmentation head.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    agree = (np.argmax(got, -1) == np.argmax(want, -1)).mean()
    assert agree >= 0.999, agree


def test_spatial_infer_folded(rng):
    from pidnet_tpu.convert import fold_params

    spec, params, state = _net(augment=False)
    folded = fold_params(params, state, spec)
    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)

    want = np.asarray(M.apply(folded, {}, jnp.asarray(x), spec, folded=True))

    mesh = make_mesh_2d(1, 8)
    fn = make_spatial_infer(spec, mesh, folded=True)
    got = np.asarray(fn(folded, {}, put_batch(mesh, x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_spatial_infer_bench_resolution(rng):
    """Class-map agreement at the BENCH resolution (1024x2048, the
    reference speed-protocol input): the spatially sharded program must
    reproduce the unsharded class decisions near-exactly — the claim
    `--spatial` makes for images too large for one chip."""
    spec, params, state = _net(augment=False)
    x = rng.standard_normal((1, 1024, 2048, 3)).astype(np.float32)

    want = np.argmax(
        np.asarray(M.apply(params, state, jnp.asarray(x), spec, train=False)), -1
    )
    mesh = make_mesh_2d(1, 8)
    fn = make_spatial_infer(spec, mesh)
    got = np.argmax(np.asarray(fn(params, state, put_batch(mesh, x))), -1)
    agree = (got == want).mean()
    assert agree >= 0.999, agree


def test_spatial_infer_wfold_matches(rng):
    """W-folding (ops/wfold.py) composes with H-dim spatial sharding: the
    fold reshapes only the UNSHARDED W axis, so the partitioner sees the
    same per-shard program. Train/eval spatial steps default wfold=True
    (matching train.step); pin the equivalence here."""
    spec, params, state = _net(augment=False)
    x = rng.standard_normal((2, 128, 256, 3)).astype(np.float32)
    mesh = make_mesh_2d(2, 4)

    plain = np.asarray(
        make_spatial_infer(spec, mesh, wfold=False)(params, state, put_batch(mesh, x))
    )
    folded = np.asarray(
        make_spatial_infer(spec, mesh, wfold=True)(params, state, put_batch(mesh, x))
    )
    np.testing.assert_allclose(folded, plain, rtol=2e-2, atol=2e-2)
    agree = (np.argmax(folded, -1) == np.argmax(plain, -1)).mean()
    assert agree >= 0.999, agree


def test_spp_hint_is_layout_only(rng):
    """spp_hint un-shards H for the 1/64 PPM stage and re-shards after —
    a layout choice that must not change the math: hinted and hintless
    programs agree to partitioner reduction-order noise."""
    spec, params, state = _net(augment=False)
    x = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    mesh = make_mesh_2d(2, 4)

    hinted = np.asarray(
        make_spatial_infer(spec, mesh)(params, state, put_batch(mesh, x))
    )
    hintless = np.asarray(
        make_spatial_infer(spec, mesh, use_spp_hint=False)(
            params, state, put_batch(mesh, x)
        )
    )
    np.testing.assert_allclose(hintless, hinted, rtol=2e-2, atol=2e-2)
    agree = (np.argmax(hintless, -1) == np.argmax(hinted, -1)).mean()
    assert agree >= 0.999, agree


def test_spatial_eval_step_matches_dp(rng):
    """make_spatial_eval_step == train.step.make_eval_step on the same
    batch: global metrics and per-output confusion matrices (the --spatial
    validation path, round-2 advisor finding). OHEM off: the DP step's
    criterion is per-shard top-k while the spatial program is global
    top-k (documented semantics difference, parallel/spatial.py:20-25),
    so scalar equality is only defined for the smooth objective."""
    from pidnet_tpu.parallel import make_mesh, shard_batch
    from pidnet_tpu.parallel.spatial import make_spatial_eval_step
    from pidnet_tpu.train import make_eval_step

    spec, params, state = _net(augment=True)
    loss_fn = FullLoss(ignore_label=255, use_ohem=False)
    img = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (2, 128, 128)).astype(np.int32)
    lab[0, :8] = 255
    edge = (rng.random((2, 128, 128)) < 0.1).astype(np.float32)
    mask = np.array([1.0, 0.0], np.float32)  # second sample is padding

    dp_mesh = make_mesh(2)
    dp_step = make_eval_step(spec, loss_fn, dp_mesh, num_classes=19)
    ts = TrainState.create(params, state)
    m_dp, cm_dp = dp_step(ts, *shard_batch(dp_mesh, img, lab, edge, mask))

    sp_mesh = make_mesh_2d(2, 4)
    sp_step = make_spatial_eval_step(spec, loss_fn, sp_mesh, num_classes=19)
    m_sp, cm_sp = sp_step(ts, *put_batch(sp_mesh, img, lab, edge, mask))

    cm_dp, cm_sp = np.asarray(cm_dp), np.asarray(cm_sp)
    assert cm_sp.shape == cm_dp.shape
    # integer pixel counts: identical totals, and only reduction-order
    # argmax flips may move pixels between cells
    np.testing.assert_allclose(cm_sp.sum(), cm_dp.sum())
    assert np.abs(cm_sp - cm_dp).sum() / cm_dp.sum() < 5e-3
    for k in m_dp:
        np.testing.assert_allclose(
            float(m_sp[k]), float(m_dp[k]), rtol=2e-2, atol=1e-3, err_msg=k
        )


def test_spatial_eval_step_ohem_budget(rng):
    """OHEM-on spatial validation: at one data row the spatial program's
    global OHEM pool (budget OHEMKEEP x n_data, n_data=1 — the tools/train
    wiring) is the same pool as the per-shard DP criterion at batch 1, so
    the losses must agree. Guards the round-3 review finding: an unscaled
    budget at n_data>1 keeps n_data x fewer hard pixels per image and
    inflates valid_loss relative to non-spatial runs."""
    from pidnet_tpu.parallel import make_mesh, shard_batch
    from pidnet_tpu.parallel.spatial import make_spatial_eval_step
    from pidnet_tpu.train import make_eval_step

    spec, params, state = _net(augment=True)
    loss_fn = FullLoss(ignore_label=255, use_ohem=True, ohem_kept=500)
    img = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (1, 128, 128)).astype(np.int32)
    lab[0, :8] = 255
    edge = (rng.random((1, 128, 128)) < 0.1).astype(np.float32)
    mask = np.ones((1,), np.float32)

    ts = TrainState.create(params, state)
    dp_mesh = make_mesh(1)
    m_dp, _ = make_eval_step(spec, loss_fn, dp_mesh, num_classes=19)(
        ts, *shard_batch(dp_mesh, img, lab, edge, mask)
    )

    sp_mesh = make_mesh_2d(1, 4)
    m_sp, _ = make_spatial_eval_step(spec, loss_fn, sp_mesh, num_classes=19)(
        ts, *put_batch(sp_mesh, img, lab, edge, mask)
    )
    # OHEM's keep-set is discrete: partitioner reduction-order noise can
    # flip pixels at the top-k threshold, so compare at the same tolerance
    # as the OHEM-on train-step test
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_dp["loss"]), rtol=1e-3, atol=1e-4
    )


def _one_step_both_meshes(loss_fn):
    """Run one spatial train step on a (1,1) and a (2,4) mesh from the same
    init; returns (params_h, [(ts, metrics), (ts, metrics)])."""
    spec, params, state = _net(augment=True)

    rng = np.random.default_rng(11)
    img = rng.standard_normal((2, 128, 128, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (2, 128, 128)).astype(np.int32)
    lab[0, :8] = 255
    edge = (rng.random((2, 128, 128)) < 0.1).astype(np.float32)

    # the step donates its TrainState; rebuild from host copies per mesh
    params_h = jax.device_get(params)
    state_h = jax.device_get(state)

    results = []
    for shape in [(1, 1), (2, 4)]:
        mesh = make_mesh_2d(*shape)
        step = make_spatial_train_step(spec, loss_fn, mesh, weight_decay=5e-4)
        ts = TrainState.create(
            {k: jnp.asarray(v) for k, v in params_h.items()},
            {k: jnp.asarray(v) for k, v in state_h.items()},
        )
        ts, metrics = step(ts, *put_batch(mesh, img, lab, edge), 0.01)
        results.append((jax.device_get(ts), jax.device_get(metrics)))
    return params_h, results


def test_spatial_train_step_matches_unsharded():
    """One (2,4)-mesh dp×sp train step == the same global-batch program on
    a trivial (1,1) mesh (global sync-BN + global OHEM on both — the
    partitioner only changes layout). With OHEM on, the objective is
    DISCRETE in the kept-pixel set: reduction-order fp noise flips a few
    pixels across the top-k threshold (the same residual as the live-s2d
    equivalence, docs/DESIGN.md). Each flipped pixel swaps its full CE
    gradient in/out of the 500-pixel mean, so per-element params can move
    ~1e-2·lr apart while the update DIRECTION stays identical — assert a
    tight loss, an update-vector cosine ≈ 1, and a loose per-element
    bound; the smooth-loss test below carries the exact-gradient check."""
    loss_fn = FullLoss(ignore_label=255, ohem_kept=500)
    params_h, results = _one_step_both_meshes(loss_fn)

    (ts_a, m_a), (ts_b, m_b) = results
    assert np.isfinite(m_a["loss"]) and np.isfinite(m_b["loss"])
    np.testing.assert_allclose(m_a["loss"], m_b["loss"], rtol=1e-4, atol=1e-5)
    upd_a = np.concatenate(
        [(ts_a.params[k] - params_h[k]).ravel() for k in sorted(ts_a.params)]
    )
    upd_b = np.concatenate(
        [(ts_b.params[k] - params_h[k]).ravel() for k in sorted(ts_b.params)]
    )
    cos = np.dot(upd_a, upd_b) / (
        np.linalg.norm(upd_a) * np.linalg.norm(upd_b)
    )
    assert cos > 0.995, f"update cosine {cos}"
    for k in ts_a.params:
        np.testing.assert_allclose(
            ts_a.params[k], ts_b.params[k], atol=5e-2, err_msg=k
        )
    for k in ts_a.state:
        np.testing.assert_allclose(
            ts_a.state[k], ts_b.state[k], rtol=1e-2, atol=1e-4, err_msg=k
        )


def test_spatial_train_step_grads_smooth_loss():
    """Same comparison with OHEM off (mostly-smooth objective; the
    `sigmoid>0.8` sb mask is the only discrete part left). Per-element
    fp32 agreement is still limited to ~1e-2·lr: BN batch variance is
    computed as E[x²]−E[x]² in fp32, and the partitioner's psum-of-partial
    -sums reordering perturbs that cancellation-prone difference by ~1e-4
    relative, which a 30-conv net at random init (head logits reach ±300)
    amplifies into ~1% gradient noise. Direction and loss pin the math:
    cosine ≈ 1 and loss to 1e-5 relative."""
    loss_fn = FullLoss(ignore_label=255, use_ohem=False)
    params_h, results = _one_step_both_meshes(loss_fn)

    (ts_a, m_a), (ts_b, m_b) = results
    np.testing.assert_allclose(m_a["loss"], m_b["loss"], rtol=1e-4, atol=1e-5)
    upd_a = np.concatenate(
        [(ts_a.params[k] - params_h[k]).ravel() for k in sorted(ts_a.params)]
    )
    upd_b = np.concatenate(
        [(ts_b.params[k] - params_h[k]).ravel() for k in sorted(ts_b.params)]
    )
    cos = np.dot(upd_a, upd_b) / (
        np.linalg.norm(upd_a) * np.linalg.norm(upd_b)
    )
    assert cos > 0.995, f"update cosine {cos}"
    for k in ts_a.params:
        np.testing.assert_allclose(
            ts_a.params[k], ts_b.params[k], atol=5e-2, err_msg=k
        )


def test_engine_inference_spatial_mesh(rng):
    """engine.make_inference{,_classmap}(spatial_mesh=...) — the eval-CLI
    `--spatial N` path — matches the single-device closures."""
    import types

    from pidnet_tpu import engine

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_OUTPUTS=2, ALIGN_CORNERS=True),
        TEST=types.SimpleNamespace(OUTPUT_INDEX=1),
    )
    spec, params, state = _net(augment=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 3)).astype(np.float32))
    mesh = make_mesh_2d(1, 8)

    probs = np.asarray(engine.make_inference(cfg, spec, params, state)(x))
    probs_sp = np.asarray(
        engine.make_inference(cfg, spec, params, state, spatial_mesh=mesh)(x)
    )
    # exp() of random-init logits (reach ±300) saturates fp32 near the
    # overflow boundary; clip so a finite-vs-inf flip at the edge doesn't
    # mask the real check (tiny relative logit differences)
    np.testing.assert_allclose(
        np.clip(probs_sp, 0, 1e30), np.clip(probs, 0, 1e30), rtol=2e-2, atol=2e-2
    )

    classes = np.asarray(
        engine.make_inference_classmap(cfg, spec, params, state)(x)
    )
    classes_sp = np.asarray(
        engine.make_inference_classmap(cfg, spec, params, state, spatial_mesh=mesh)(x)
    )
    assert classes_sp.dtype == np.int32 and classes_sp.shape == classes.shape
    assert (classes_sp == classes).mean() >= 0.995


def test_mesh_2d_too_many_devices():
    with pytest.raises(ValueError, match="requested"):
        make_mesh_2d(4, 4)
