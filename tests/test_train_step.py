"""Data-parallel train/eval step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel import make_mesh, shard_batch
from pidnet_tpu.train import TrainState, make_eval_step, make_train_step, poly_lr

SPEC = M.spec_for("pidnet_s", 19, augment=True)


def _batch(rng, n=8, h=64, w=64):
    img = rng.standard_normal((n, h, w, 3), dtype=np.float32)
    lab = rng.integers(0, 19, (n, h, w)).astype(np.int32)
    lab[rng.random((n, h, w)) < 0.1] = 255
    edge = (rng.random((n, h, w)) < 0.1).astype(np.float32)
    return img, lab, edge


@pytest.fixture(scope="module")
def _setup():
    mesh = make_mesh(8)
    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=1000)
    return mesh, params, state, loss_fn


@pytest.fixture
def setup(_setup):
    # the train step donates its TrainState buffers; hand each test copies
    mesh, params, state, loss_fn = _setup
    return (
        mesh,
        jax.tree.map(jnp.copy, params),
        jax.tree.map(jnp.copy, state),
        loss_fn,
    )


def test_train_step_runs_and_learns(setup, rng):
    mesh, params, state, loss_fn = setup
    step = make_train_step(SPEC, loss_fn, mesh, weight_decay=5e-4)
    ts = TrainState.create(params, state)
    img, lab, edge = shard_batch(mesh, *_batch(rng))
    losses = []
    for it in range(4):
        lr = poly_lr(1e-4, 100, it)
        ts, metrics = step(ts, img, lab, edge, lr)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] != losses[0]  # params actually update
    assert float(jnp.abs(ts.momentum["conv1.0.weight"]).max()) > 0
    # BN running stats moved off init
    assert any(
        float(jnp.abs(v).max()) > 1e-6
        for k, v in ts.state.items()
        if k.endswith("running_mean")
    )


def test_dp_matches_single_device(setup, rng):
    """The 8-way DP step equals a 1-device step when per-shard stats are
    batch-identical: replicate the same per-shard batch 8x -> per-shard
    BN/OHEM see identical data, so grads/update must match exactly."""
    mesh8, params, state, loss_fn = setup
    mesh1 = make_mesh(1)
    img1, lab1, edge1 = _batch(rng, n=1)
    img8 = np.repeat(img1, 8, 0)
    lab8 = np.repeat(lab1, 8, 0)
    edge8 = np.repeat(edge1, 8, 0)

    # pad_batch off: this test checks pure DP equivalence (per-shard N=1
    # would otherwise pad to 8 on mesh8 but not on mesh1, and the
    # mask-weighted BN stat expression differs at fp epsilon from the
    # plain mean — covered by test_pad_batch_matches_unpadded instead)
    step8 = make_train_step(SPEC, loss_fn, mesh8, pad_batch=False)
    step1 = make_train_step(SPEC, loss_fn, mesh1, pad_batch=False)
    fresh = lambda: TrainState.create(  # noqa: E731 — step donates its input
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
    )
    ts8, m8 = step8(fresh(), *shard_batch(mesh8, img8, lab8, edge8), 0.01)
    ts1, m1 = step1(fresh(), *shard_batch(mesh1, img1, lab1, edge1), 0.01)
    assert abs(float(m8["loss"]) - float(m1["loss"])) < 1e-5
    for k in list(ts8.params)[:20]:
        np.testing.assert_allclose(
            np.asarray(ts8.params[k]), np.asarray(ts1.params[k]), rtol=1e-5, atol=1e-6
        )


def test_s2d_front_matches_normal_train(setup, rng):
    """The live space-to-depth front (derived kernels + grouped BN) is the
    same training computation as the normal layout."""
    mesh, params, state, loss_fn = setup
    img, lab, edge = _batch(rng, n=8)
    out = {}
    for s2d in (False, True):
        step = make_train_step(SPEC, loss_fn, mesh, stem_s2d=s2d)
        ts = TrainState.create(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
        )
        ts, m = step(ts, *shard_batch(mesh, img, lab, edge), 0.01)
        out[s2d] = (float(m["loss"]), ts)
    assert abs(out[True][0] - out[False][0]) < 1e-4 * abs(out[False][0])
    # compare the UPDATE vectors by norm: tiny logit noise flips pixels at
    # the discrete OHEM threshold, so per-element equality is not expected,
    # but the updates must be the same direction/magnitude. Headroom on the
    # bound: oneDNN CPU convs are run-to-run nondeterministic in reduction
    # order, so the residual itself varies (observed 0.045-0.051).
    for k in ("layer1.0.conv1.weight", "conv1.0.weight", "layer3.0.conv1.weight"):
        d_true = np.asarray(out[True][1].params[k]) - np.asarray(params[k])
        d_false = np.asarray(out[False][1].params[k]) - np.asarray(params[k])
        rel = np.linalg.norm(d_true - d_false) / (np.linalg.norm(d_false) + 1e-12)
        assert rel < 0.08, (k, rel)
    for k in ("conv1.1.running_mean", "layer1.0.bn1.running_var"):
        np.testing.assert_allclose(
            np.asarray(out[True][1].state[k]),
            np.asarray(out[False][1].state[k]),
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.parametrize("use_ohem", [False, True])
def test_pad_batch_matches_unpadded(setup, rng, use_ohem):
    """pad_batch (shard batch 6 -> 8 with masked samples) is numerically
    the SAME training step: padded samples are excluded from BN statistics
    (mask-weighted stats) and every loss term, so loss/grads/BN state must
    match the unpadded program. The weighted-stat expression (sum(x*w)/cnt
    vs mean(x)) differs at fp epsilon, which the discrete OHEM keep-set
    can amplify — so loss is tight, update direction ~exact, per-element
    loose (the smooth case gets a tighter bound)."""
    _, params, state, _ = setup
    loss_fn = FullLoss(ignore_label=255, ohem_kept=1000, use_ohem=use_ohem)
    mesh1 = make_mesh(1)
    img, lab, edge = _batch(rng, n=6)

    out = {}
    for pad in (False, True):
        step = make_train_step(SPEC, loss_fn, mesh1, pad_batch=pad)
        ts = TrainState.create(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
        )
        ts, m = step(ts, *shard_batch(mesh1, img, lab, edge), 0.01)
        out[pad] = (float(m["loss"]), float(m["acc"]), jax.device_get(ts))
    (l0, a0, ts0), (l1, a1, ts1) = out[False], out[True]
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    # pixel accuracy counts argmax decisions; logit fp noise between the
    # two compiled programs flips near-ties at random init (~1e-3 of pixels)
    np.testing.assert_allclose(a1, a0, atol=2e-3)
    upd0 = np.concatenate(
        [(ts0.params[k] - np.asarray(params[k])).ravel() for k in sorted(ts0.params)]
    )
    upd1 = np.concatenate(
        [(ts1.params[k] - np.asarray(params[k])).ravel() for k in sorted(ts1.params)]
    )
    cos = np.dot(upd0, upd1) / (np.linalg.norm(upd0) * np.linalg.norm(upd1))
    assert cos > 0.999, f"update cosine {cos}"
    # even with OHEM off, the sb loss's sigmoid>0.8 mask is discrete and
    # BN's fp-epsilon stat difference amplifies through 30 convs at random
    # init (old positional draw: max 5e-4 smooth, ~2e-3 with OHEM; the
    # round-5 name-keyed draw reached 2.009e-3 smooth — the bound is
    # draw-dependent, the update-cosine gate above is the real invariant)
    atol = 5e-3
    for k in ts0.params:
        np.testing.assert_allclose(ts1.params[k], ts0.params[k], atol=atol, err_msg=k)
    for k in ts0.state:
        np.testing.assert_allclose(
            ts1.state[k], ts0.state[k], rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_sgd_matches_torch(rng):
    """SGD(momentum, wd) update parity vs torch.optim.SGD."""
    import torch

    from pidnet_tpu.train.step import _sgd

    w0 = rng.standard_normal(16).astype(np.float32)
    g0 = rng.standard_normal(16).astype(np.float32)
    g1 = rng.standard_normal(16).astype(np.float32)

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in (g0, g1):
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    params = {"w": jnp.asarray(w0)}
    bufs = {"w": jnp.zeros_like(params["w"])}
    for g in (g0, g1):
        params, bufs = _sgd(params, {"w": jnp.asarray(g)}, bufs, 0.1, 0.9, 0.01, False)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=1e-6, atol=1e-6)


def test_eval_step_confusion(setup, rng):
    mesh, params, state, loss_fn = setup
    # per-shard N=1 -> the default pad_batch pads each shard to 8 masked
    # rows; the count-exact CM assertions below prove the padding is inert
    step = make_eval_step(SPEC, loss_fn, mesh, num_classes=19)
    ts = TrainState.create(params, state)
    img, lab, edge = _batch(rng)
    mask = np.ones(img.shape[0], np.float32)
    metrics, cms = step(ts, *shard_batch(mesh, img, lab, edge, mask))
    cms = np.asarray(cms)
    assert cms.shape == (2, 19, 19)
    n_valid = int((lab != 255).sum())
    assert int(cms[0].sum()) == n_valid == int(cms[1].sum())

    # unpadded program: identical metrics and confusion matrices
    step_np = make_eval_step(SPEC, loss_fn, mesh, num_classes=19, pad_batch=False)
    metrics_np, cms_np = step_np(ts, *shard_batch(mesh, img, lab, edge, mask))
    np.testing.assert_array_equal(np.asarray(cms_np), cms)
    np.testing.assert_allclose(
        float(metrics_np["loss"]), float(metrics["loss"]), rtol=1e-5
    )
    from pidnet_tpu.metrics import acc_from_cm, iou_from_cm

    iou, miou = iou_from_cm(cms[1])
    assert iou.shape == (19,) and 0 <= miou <= 1
    pa, ma = acc_from_cm(cms[1])
    assert 0 <= pa <= 1 and 0 <= ma <= 1


def test_checkpoint_roundtrip(tmp_path, setup):
    from pidnet_tpu.train import checkpoint as ckpt

    _, params, state, _ = setup
    ts = TrainState.create(params, state)
    ckpt.save_train_checkpoint(str(tmp_path), 7, 0.5, ts)
    payload = ckpt.load_train_checkpoint(str(tmp_path))
    assert payload["epoch"] == 7 and payload["best_mIoU"] == 0.5
    np.testing.assert_array_equal(
        payload["params"]["conv1.0.weight"], np.asarray(params["conv1.0.weight"])
    )
    ckpt.save_model(str(tmp_path / "best.msgpack"), params, state)
    p2, s2 = ckpt.load_model(str(tmp_path / "best.msgpack"))
    assert set(p2) == set(params) and set(s2) == set(state)
