"""The committed 2k-step training-run artifact (runs/train2k) and the
checkpoint->replay bit-stability it claims.

scripts/train_run_artifact.py records the real bf16 recipe on the chip;
this test (CPU mesh) (1) asserts the committed summary's invariants —
no divergence, steady step time, bitwise on-chip replay — and (2)
replays the same checkpoint->resume mechanism at small scale, demanding
bit-identical losses and final params (VERDICT r4 missing #1 / next #6)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SUMMARY = os.path.join(os.path.dirname(__file__), "..", "runs", "train2k", "summary.json")


def test_committed_run_summary_invariants():
    if not os.path.exists(SUMMARY):
        pytest.skip("runs/train2k not yet recorded on the chip")
    with open(SUMMARY) as f:
        s = json.load(f)
    assert s["recipe"]["steps"] >= 2000
    assert s["recipe"]["compute_dtype"] == "bfloat16"
    assert s["loss"]["all_finite"]
    assert not s["diverged"]
    assert s["loss"]["last100_mean"] < s["loss"]["first10_mean"]
    assert s["bn_health"]["all_finite"]
    assert s["throughput"]["steady"], "step time drifted >15% over the run"
    assert s["replay_bitwise"], "on-chip 50-step replay was not bit-identical"


def test_checkpoint_replay_is_bitwise(tmp_path):
    import importlib.util

    spec_mod = importlib.util.spec_from_file_location(
        "train_run_artifact",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "train_run_artifact.py"),
    )
    artifact = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(artifact)
    synthetic_epoch = artifact.synthetic_epoch

    from pidnet_tpu.losses import FullLoss
    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.parallel import make_mesh, shard_batch
    from pidnet_tpu.train import TrainState, make_train_step
    from pidnet_tpu.train.checkpoint import load as ckpt_load
    from pidnet_tpu.train.checkpoint import save as ckpt_save

    rng = np.random.default_rng(304)
    images, labels, edges = synthetic_epoch(rng, 4, 64, block=16)
    mesh = make_mesh(2)
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(304), spec)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=2000)
    step = make_train_step(spec, loss_fn, mesh, weight_decay=5e-4)
    ts = TrainState.create(params, state)
    batch = shard_batch(mesh, images, labels, edges)

    ckpt = str(tmp_path / "step0.msgpack")
    ckpt_save(ckpt, {"params": ts.params, "state": ts.state, "momentum": ts.momentum})

    def run10(ts):
        losses = []
        for _ in range(10):
            ts, m = step(ts, *batch, 0.01)
            losses.append(float(m["loss"]))
        return ts, losses

    ts_a, losses_a = run10(ts)

    c = ckpt_load(ckpt)
    ts_b = TrainState(
        params=jax.tree.map(jnp.asarray, c["params"]),
        state=jax.tree.map(jnp.asarray, c["state"]),
        momentum=jax.tree.map(jnp.asarray, c["momentum"]),
    )
    ts_b, losses_b = run10(ts_b)

    assert losses_a == losses_b
    for k in ts_a.params:
        assert (np.asarray(ts_a.params[k]) == np.asarray(ts_b.params[k])).all(), k
