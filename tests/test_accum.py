"""Gradient accumulation as virtual data-parallel shards.

`make_train_step(accum_steps=A)` must equal a physical A-times-larger
data mesh: same per-virtual-shard BN/OHEM semantics, same averaged
gradients/metrics/BN-state updates (train/step.py accum_steps docstring).
The reference's recipe fixes the GLOBAL batch (BATCH_SIZE_PER_GPU x
len(GPUS), reference tools/train.py:82,152); accumulation is how fewer
chips reproduce it without changing training semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel import make_mesh, shard_batch
from pidnet_tpu.parallel.mesh import shard_microbatches
from pidnet_tpu.train import TrainState, make_train_step

SPEC = M.spec_for("pidnet_s", 19, augment=True)


def _batch(rng, n, h=64, w=64):
    img = rng.standard_normal((n, h, w, 3), dtype=np.float32)
    lab = rng.integers(0, 19, (n, h, w)).astype(np.int32)
    lab[rng.random((n, h, w)) < 0.1] = 255
    edge = (rng.random((n, h, w)) < 0.1).astype(np.float32)
    return img, lab, edge


@pytest.fixture(scope="module")
def init():
    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=1000)
    return params, state, loss_fn


def _fresh(params, state):
    return TrainState.create(
        jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
    )


def test_accum_matches_physical_mesh(init, rng):
    """accum=2 over a 4-device mesh == one step of an 8-device mesh on the
    same 24 samples: sample->virtual-shard chunking is identical (chunks
    of 3, in order), so the only differences are cross-shard reduction
    order (psum over 8 vs psum over 4 + add over 2) — fp reassociation."""
    params, state, loss_fn = init
    img, lab, edge = _batch(rng, n=24)

    step8 = make_train_step(SPEC, loss_fn, make_mesh(8), pad_batch=False)
    mesh4 = make_mesh(4)
    step4x2 = make_train_step(
        SPEC, loss_fn, mesh4, pad_batch=False, accum_steps=2
    )

    ts8, m8 = step8(
        _fresh(params, state), *shard_batch(make_mesh(8), img, lab, edge), 0.01
    )
    ts4, m4 = step4x2(
        _fresh(params, state), *shard_microbatches(mesh4, 2, img, lab, edge), 0.01
    )
    np.testing.assert_allclose(float(m4["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m4["acc"]), float(m8["acc"]), atol=2e-3)
    # per-chunk math is identical; residuals are reduction-order fp noise
    # between two differently-compiled programs, amplified by discrete
    # OHEM keep-set flips (same caveat as test_pad_batch_matches_unpadded):
    # update vectors must agree in direction ~exactly, elements absolutely
    upd8 = np.concatenate(
        [np.asarray(ts8.params[k] - params[k]).ravel() for k in sorted(ts8.params)]
    )
    upd4 = np.concatenate(
        [np.asarray(ts4.params[k] - params[k]).ravel() for k in sorted(ts4.params)]
    )
    cos = np.dot(upd8, upd4) / (np.linalg.norm(upd8) * np.linalg.norm(upd4))
    assert cos > 0.9999, f"update cosine {cos}"
    for k in ts8.params:
        np.testing.assert_allclose(
            np.asarray(ts4.params[k]), np.asarray(ts8.params[k]),
            atol=1e-4, err_msg=k,
        )
    for k in ts8.state:
        np.testing.assert_allclose(
            np.asarray(ts4.state[k]), np.asarray(ts8.state[k]),
            rtol=1e-3, atol=1e-5, err_msg=k,
        )


def test_accum_production_path_runs(init, rng):
    """The recipe shape: per-shard batch 6 (padded to 8 in every
    microbatch by pad_batch) x 1 device x accum 2 — loss finite, params
    update, BN stats move."""
    params, state, loss_fn = init
    mesh1 = make_mesh(1)
    step = make_train_step(SPEC, loss_fn, mesh1, accum_steps=2)
    ts = _fresh(params, state)
    img, lab, edge = _batch(rng, n=12)
    ts, m = step(ts, *shard_microbatches(mesh1, 2, img, lab, edge), 0.01)
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.abs(ts.momentum["conv1.0.weight"]).max()) > 0
    assert any(
        float(jnp.abs(v).max()) > 1e-6
        for k, v in ts.state.items()
        if k.endswith("running_mean")
    )


def test_shard_microbatches_layout():
    """(A*G, ...) host batches become (A, G, ...) stacks, consecutive
    G-chunks = microbatches, dim 1 sharded."""
    mesh = make_mesh(4)
    x = np.arange(24, dtype=np.float32).reshape(24, 1)
    y = shard_microbatches(mesh, 2, x)
    assert y.shape == (2, 12, 1)
    np.testing.assert_array_equal(np.asarray(y[0, :, 0]), np.arange(12))
    np.testing.assert_array_equal(np.asarray(y[1, :, 0]), np.arange(12, 24))
    with pytest.raises(ValueError):
        shard_microbatches(mesh, 5, x)


def test_accum_rejects_sync_bn(init):
    """sync-BN can only pmean within one microbatch's physical shards, so
    the physical-mesh equivalence would silently not hold — refused."""
    params, state, loss_fn = init
    with pytest.raises(ValueError, match="sync_bn"):
        make_train_step(SPEC, loss_fn, make_mesh(1), accum_steps=2, sync_bn=True)
