"""Sync-BN across the mesh and torch-format checkpoint export."""

import numpy as np

import jax
import jax.numpy as jnp

from pidnet_tpu.convert import convert_state_dict
from pidnet_tpu.convert.torch_weights import export_state_dict
from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel import make_mesh, shard_batch
from pidnet_tpu.train import TrainState, make_train_step

SPEC = M.spec_for("pidnet_s", 19, augment=True)


def _batch(rng, n=8):
    img = rng.standard_normal((n, 64, 64, 3), dtype=np.float32)
    lab = rng.integers(0, 19, (n, 64, 64)).astype(np.int32)
    edge = (rng.random((n, 64, 64)) < 0.1).astype(np.float32)
    return img, lab, edge


def test_sync_bn_differs_from_per_shard(rng):
    """With per-shard data DIFFERENT across shards, sync-BN (cross-shard
    batch stats) must produce different updates than per-shard BN."""
    mesh = make_mesh(8)
    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=500)
    batch = _batch(rng)

    results = {}
    for sync in (False, True):
        step = make_train_step(SPEC, loss_fn, mesh, sync_bn=sync)
        ts = TrainState.create(
            jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
        )
        ts, m = step(ts, *shard_batch(mesh, *batch), 0.01)
        results[sync] = (
            np.asarray(ts.state["conv1.1.running_var"]),
            np.asarray(ts.params["conv1.1.weight"]),
            float(m["loss"]),
        )
    # the mean of per-shard means equals the global mean, but the variances
    # (and hence normalized activations and the update) must differ
    assert not np.allclose(results[False][0], results[True][0])
    assert not np.allclose(results[False][1], results[True][1])
    assert np.isfinite(results[True][2])


def test_export_state_dict_roundtrip():
    params, state = M.init(jax.random.PRNGKey(1), SPEC)
    sd = export_state_dict(params, state)  # torch layout, 'model.' prefix
    assert "model.conv1.0.weight" in sd
    assert sd["model.conv1.0.weight"].shape == (32, 3, 3, 3)  # OIHW
    p2, s2 = M.init(jax.random.PRNGKey(2), SPEC)
    p2, s2, n = convert_state_dict(sd, p2, s2)
    assert n == len(sd)
    np.testing.assert_allclose(
        np.asarray(p2["conv1.0.weight"]), np.asarray(params["conv1.0.weight"])
    )
    np.testing.assert_allclose(
        np.asarray(s2["conv1.1.running_var"]), np.asarray(state["conv1.1.running_var"])
    )
