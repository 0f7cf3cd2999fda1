"""Engine-level behavior on the virtual 8-device mesh."""

import numpy as np

import jax

from pidnet_tpu.config import default_config
from pidnet_tpu import engine
from pidnet_tpu.losses import FullLoss
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel import make_mesh
from pidnet_tpu.train import TrainState, make_eval_step
from pidnet_tpu.utils import TBWriter


class _FakeLoader:
    """Yields one full batch and one partial batch (like a non-divisible
    val set)."""

    batch_size = 8

    def __init__(self, rng):
        self.batches = []
        for n in (8, 3):
            img = rng.standard_normal((n, 64, 64, 3)).astype(np.float32)
            lab = rng.integers(0, 19, (n, 64, 64)).astype(np.int32)
            edge = (rng.random((n, 64, 64)) < 0.1).astype(np.float32)
            self.batches.append((img, lab, edge, None, None))

    def __iter__(self):
        return iter(self.batches)


def test_validate_pads_partial_batches(rng):
    cfg = default_config()
    cfg.TRAIN.IGNORE_LABEL = 255
    cfg.freeze()
    mesh = make_mesh(8)
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=100)
    eval_step = make_eval_step(spec, loss_fn, mesh, num_classes=19)
    ts = TrainState.create(params, state)
    writer_dict = {"writer": TBWriter(""), "valid_global_steps": 0}

    # direct check: a partial batch padded up to 8 contributes exactly the
    # real images' pixels to the confusion matrix, and its metrics equal an
    # UNPADDED run with the same one-sample-per-shard layout (3-dev mesh)
    from pidnet_tpu.parallel import shard_batch

    img = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (3, 64, 64)).astype(np.int32)
    edge = (rng.random((3, 64, 64)) < 0.1).astype(np.float32)
    img_p = np.concatenate([img, np.repeat(img[-1:], 5, 0)])
    lab_p = np.concatenate([lab, np.full((5, 64, 64), 255, lab.dtype)])
    edge_p = np.concatenate([edge, np.zeros((5, 64, 64), edge.dtype)])
    mask_p = (np.arange(8) < 3).astype(np.float32)
    metrics_p, cms = eval_step(ts, *shard_batch(mesh, img_p, lab_p, edge_p, mask_p))
    assert int(np.asarray(cms)[0].sum()) == 3 * 64 * 64

    mesh3 = make_mesh(3)
    eval_step3 = make_eval_step(spec, loss_fn, mesh3, num_classes=19)
    metrics_u, cms_u = eval_step3(
        ts, *shard_batch(mesh3, img, lab, edge, np.ones(3, np.float32))
    )
    for k in metrics_u:
        np.testing.assert_allclose(
            float(metrics_p[k]), float(metrics_u[k]), rtol=1e-5,
            err_msg=f"padded metric {k} != unpadded",
        )
    np.testing.assert_allclose(np.asarray(cms), np.asarray(cms_u), atol=1e-3)

    loader = _FakeLoader(rng)
    ave_loss, mean_iou, iou = engine.validate(
        cfg, loader, eval_step, ts, mesh, writer_dict
    )
    assert 0.0 <= mean_iou <= 1.0
    assert np.isfinite(ave_loss)
    assert iou.shape == (19,)


def test_train_one_epoch_aborts_on_nonfinite_loss(rng):
    """Divergence guard: a NaN loss from the step must abort the epoch
    with an actionable error, not be averaged into the meters forever."""
    import pytest

    cfg = default_config()
    cfg.freeze()
    mesh = make_mesh(8)
    writer_dict = {"writer": TBWriter(""), "train_global_steps": 0}

    calls = []

    def bad_step(ts, images, labels, edges, lr):
        calls.append(lr)
        val = np.nan if len(calls) >= 2 else 1.0
        return ts, {"loss": val, "acc": 0.5, "sem_loss": 0.4, "bce_loss": 0.1}

    loader = _FakeLoader(rng)
    loader.batches = loader.batches[:1] * 4  # 4 full batches
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        engine.train_one_epoch(
            cfg, 0, 4, 16, 0.01, loader, bad_step, None, mesh, writer_dict,
            place_batch=lambda *a: a,
        )
