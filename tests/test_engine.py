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


def test_loader_wrap_pad_accounting():
    """Multi-process loaders wrap-pad ranks to equal counts; the duplicate
    is at most one per rank, at the TAIL, and samples_per_epoch excludes
    it (engine.validate uses it to keep multi-host mIoU exact)."""
    from pidnet_tpu.data.loader import Loader

    class _DS(list):
        pass

    ds = _DS(range(5))
    l0 = Loader(ds, 2, num_shards=2, shard_index=0)
    l1 = Loader(ds, 2, num_shards=2, shard_index=1)
    # padded order = [0..4, 0]; rank0 gets positions 0,2,4 (all real),
    # rank1 gets 1,3,5 where 5 duplicates sample 0
    assert l0.samples_per_epoch == 3
    assert l1.samples_per_epoch == 2
    o1 = l1._shard_order()
    assert len(o1) == 3 and o1[-1] == 0  # duplicate is last
    single = Loader(ds, 2)
    assert single.samples_per_epoch == 5


def test_validate_masks_wrap_pad_duplicates(rng):
    """validate() must exclude a rank's wrap-pad duplicate samples from
    both the loss average and the confusion matrices."""
    cfg = default_config()
    cfg.TRAIN.IGNORE_LABEL = 255
    cfg.freeze()

    class _ShardLoader(_FakeLoader):
        """3 local samples of which the last is a wrap-pad duplicate,
        yielded as one batch of 2 and one partial batch of 1."""

        batch_size = 2
        samples_per_epoch = 2  # 3 yielded - 1 duplicate

        def __init__(self, rng):
            img = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
            lab = rng.integers(0, 19, (3, 64, 64)).astype(np.int32)
            edge = (rng.random((3, 64, 64)) < 0.1).astype(np.float32)
            self.batches = [
                (img[:2], lab[:2], edge[:2], None, None),
                (img[2:], lab[2:], edge[2:], None, None),
            ]

    masks = []

    def fake_eval_step(ts, images, labels, edges, mask):
        masks.append(np.asarray(mask))
        n_pix = float(mask.sum()) * 64 * 64
        cm = np.zeros((2, 19, 19), np.float32)
        cm[:, 0, 0] = n_pix
        return {"loss": 1.0}, cm

    writer_dict = {"writer": TBWriter(""), "valid_global_steps": 0}
    loader = _ShardLoader(rng)
    ave_loss, _, _ = engine.validate(
        cfg, loader, fake_eval_step, None, None, writer_dict,
        place_batch=lambda *a: a,
    )
    # batch 1: both samples real; batch 2: the single yielded sample is the
    # wrap-pad duplicate AND the batch is padded to size 2 — all masked out
    np.testing.assert_array_equal(masks[0], [1.0, 1.0])
    np.testing.assert_array_equal(masks[1], [0.0, 0.0])
    assert np.isfinite(ave_loss)


def test_eval_step_bf16_classmap_path(rng):
    """BF16_EVAL confusion matrices go through the fused classmap path
    (no full-res logits in HBM); totals must still respect the sample
    mask and the matrices must stay close to the fp32 parity path's."""
    import jax.numpy as jnp

    mesh = make_mesh(8)
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    loss_fn = FullLoss(ignore_label=255, ohem_kept=100)
    ts = TrainState.create(params, state)
    from pidnet_tpu.parallel import shard_batch

    img = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (8, 64, 64)).astype(np.int32)
    edge = (rng.random((8, 64, 64)) < 0.1).astype(np.float32)
    mask = (np.arange(8) < 5).astype(np.float32)  # 3 padding samples
    lab[5:] = 255

    step32 = make_eval_step(spec, loss_fn, mesh, num_classes=19)
    step16 = make_eval_step(
        spec, loss_fn, mesh, num_classes=19, compute_dtype=jnp.bfloat16
    )
    batch = shard_batch(mesh, img, lab, edge, mask)
    _, cms32 = step32(ts, *batch)
    _, cms16 = step16(ts, *batch)
    cms32, cms16 = np.asarray(cms32), np.asarray(cms16)
    # padding defense survives the classmap path: only real pixels counted
    assert int(cms16[0].sum()) == 5 * 64 * 64
    assert int(cms16[1].sum()) == 5 * 64 * 64
    # bf16 forward flips some argmaxes at random init; the matrices must
    # still broadly agree with fp32
    agree = 1.0 - np.abs(cms16 - cms32).sum() / (2 * cms32.sum())
    assert agree > 0.9, agree


class _IndexedDataset:
    """8 tiny samples whose image pixels encode the sample index, so a
    consumer can reconstruct exactly which samples each step saw."""

    def __init__(self, n=8):
        self.n = n
        self.epoch = 0

    def __len__(self):
        return self.n

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __getitem__(self, i):
        img = np.full((4, 4, 3), float(i), np.float32)
        lab = np.zeros((4, 4), np.uint8)
        edge = np.zeros((4, 4), np.float32)
        return img, lab, edge, np.array([4, 4, 3]), str(i)


def test_mid_epoch_resume_is_iteration_exact():
    """Preemption resume (tools/train.py + Loader.set_epoch/skip_batches):
    interrupting an epoch at step k and resuming with start_iter=k must
    replay EXACTLY the remaining steps — same samples in the same order
    with the same poly-LR positions — as the uninterrupted run."""
    from pidnet_tpu.data.loader import Loader

    cfg = default_config()
    cfg.PRINT_FREQ = 100
    cfg.freeze()
    writer_dict = {"writer": TBWriter(""), "train_global_steps": 0}

    def record_into(trace):
        def step(ts, images, labels, edges, lr):
            trace.append((tuple(images[:, 0, 0, 0].astype(int)), round(float(lr), 9)))
            return ts, {"loss": 1.0, "acc": 0.5, "sem_loss": 0.4, "bce_loss": 0.1}

        return step

    def make_loader():
        return Loader(_IndexedDataset(), 2, shuffle=True, drop_last=True, seed=7)

    # uninterrupted: epochs 0 and 1 (4 steps each)
    full = []
    loader = make_loader()
    for epoch in (0, 1):
        _, done = engine.train_one_epoch(
            cfg, epoch, 4, 16, 0.01, loader, record_into(full), None, None,
            writer_dict, place_batch=lambda *a: a,
        )
        assert done == 4

    # interrupted at step 2 of epoch 0, then resumed in a FRESH loader
    # (fresh process): the combined trace must equal the uninterrupted one
    part = []
    stop_after = {"n": 2}

    def should_stop():
        return len(part) >= stop_after["n"]

    _, done = engine.train_one_epoch(
        cfg, 0, 4, 16, 0.01, make_loader(), record_into(part), None, None,
        writer_dict, place_batch=lambda *a: a, should_stop=should_stop,
    )
    assert done == 2
    resumed_loader = make_loader()  # fresh process: loader state reset
    _, done = engine.train_one_epoch(
        cfg, 0, 4, 16, 0.01, resumed_loader, record_into(part), None, None,
        writer_dict, place_batch=lambda *a: a, start_iter=2,
    )
    assert done == 4
    _, done = engine.train_one_epoch(
        cfg, 1, 4, 16, 0.01, resumed_loader, record_into(part), None, None,
        writer_dict, place_batch=lambda *a: a,
    )
    assert done == 4
    assert part == full
    # sanity: shuffling actually happened (epochs see different orders)
    assert [s for s, _ in full[:4]] != [s for s, _ in full[4:]]


class _EvalLoader:
    """testval-shaped loader: (images, labels, _, _, names), one full
    batch and a non-divisible tail."""

    def __init__(self, rng, sizes=(8, 3), hw=(64, 64)):
        self.batches = []
        k = 0
        for n in sizes:
            img = rng.standard_normal((n, *hw, 3)).astype(np.float32)
            lab = rng.integers(0, 19, (n, *hw)).astype(np.int32)
            names = [f"img{k + i}" for i in range(n)]
            k += n
            self.batches.append((img, lab, None, None, names))

    def __iter__(self):
        return iter(self.batches)


def _eval_cfg():
    cfg = default_config()
    cfg.DATASET.NUM_CLASSES = 19
    cfg.TRAIN.IGNORE_LABEL = 255
    cfg.MODEL.NUM_OUTPUTS = 2
    cfg.TEST.OUTPUT_INDEX = 1
    return cfg.freeze()


def test_mesh_parallel_testval_matches_single_device(rng):
    """Offline eval through an 8-device data mesh (shard_map over the
    batch dim, tail batch padded with repeats) reports the same confusion
    matrices / mIoU as the single-device batch-1 loop."""
    cfg = _eval_cfg()
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)

    single = engine.make_inference(cfg, spec, params, state)
    mesh = make_mesh(8)
    meshed = engine.make_inference(cfg, spec, params, state, data_mesh=mesh)

    loader = _EvalLoader(rng)
    got = engine.testval(cfg, None, loader, meshed, sv_pred=False, batch_pad=8)
    want = engine.testval(cfg, None, loader, single, sv_pred=False, batch_pad=1)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-6)  # mIoU
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)  # per-class IoU
    np.testing.assert_allclose(got[2], want[2], rtol=1e-6)  # pixel acc


def test_baked_inference_matches_arg_weights(rng):
    """bake=True (weights as jit constants, the serving mode) is
    numerically identical to the weights-as-arguments closure."""
    cfg = _eval_cfg()
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(1), spec)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    plain = engine.make_inference(cfg, spec, params, state)(np.asarray(x))
    baked = engine.make_inference(cfg, spec, params, state, bake=True)(
        np.asarray(x)
    )
    # constant-folding the weights lets XLA reassociate fp32 reductions, so
    # the two programs differ by ~1e-4 relative; compare the (log-space)
    # logits with a tolerance sized for a recompilation, not bit-equality
    tiny = np.float32(1e-38)  # clamp exp-underflowed probs out of log(0)
    np.testing.assert_allclose(
        np.log(np.maximum(np.asarray(baked), tiny)),
        np.log(np.maximum(np.asarray(plain), tiny)),
        atol=5e-3, rtol=0,
    )

    plain_cm = engine.make_inference_classmap(cfg, spec, params, state)(
        np.asarray(x)
    )
    baked_cm = engine.make_inference_classmap(cfg, spec, params, state, bake=True)(
        np.asarray(x)
    )
    agree = (np.asarray(baked_cm) == np.asarray(plain_cm)).mean()
    assert agree >= 0.9995, f"baked/plain classmap agreement {agree}"
