"""BiSeNetV1+ADB+Bag extension architecture (reference's second ablation):
shapes, torch parity (incl. the ResNet-18 extractor), folding, training.
"""

import sys

import numpy as np
import pytest
import torch

import jax

from tests.conftest import REFERENCE_ROOT, reference_available
from pidnet_tpu.models import bisenet, pidnet as M

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_bisenet_shapes():
    spec = bisenet.spec_for("bisenet_adb_bag", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    x = np.zeros((1, 64, 128, 3), np.float32)
    out = M.apply(params, state, x, spec)
    # heads upsample to INPUT resolution inside the model (reference :147)
    assert [tuple(o.shape) for o in out] == [
        (1, 64, 128, 19), (1, 64, 128, 19), (1, 64, 128, 19), (1, 64, 128, 1)
    ]
    spec1 = bisenet.spec_for("bisenet_adb_bag", 11, augment=False)
    params1, state1 = M.init(jax.random.PRNGKey(0), spec1)
    assert tuple(M.apply(params1, state1, x, spec1).shape) == (1, 64, 128, 11)


def _reference_bisenet(tmp_path, seed: int):
    import types

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.model_utils as ref_utils  # type: ignore

    sys.modules.setdefault("models.others.model_utils", ref_utils)
    # the file imports torchvision (bisenet_adb_bag.py:7) but never uses it;
    # this env has no torchvision — stub it
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    import models.others.bisenet_adb_bag as ref_bs  # type: ignore

    # Resnet18.init_weight torch.loads the given path (resnet.py:82-88);
    # an empty state_dict keeps the random init
    dummy = str(tmp_path / "resnet18.pth")
    torch.save({}, dummy)
    torch.manual_seed(seed)
    net = ref_bs.BiSeNetV1(19, dummy, aux_mode=True)
    sd = net.state_dict()
    gen = torch.Generator().manual_seed(seed)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
        elif v.ndim == 1:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.2
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
    net.load_state_dict(sd)
    net.eval()
    return net, sd


def test_bisenet_logit_parity(tmp_path, rng):
    """All four heads match the reference torch net — covers the ResNet-18
    extractor (resnet.py:54-80), ARMs, FFM, ADB grafting, and Light_Bag."""
    from pidnet_tpu.convert import convert_state_dict

    net, sd = _reference_bisenet(tmp_path, seed=23)
    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = [o.permute(0, 2, 3, 1).numpy() for o in want]

    spec = bisenet.spec_for("bisenet_adb_bag", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    params, state, n_loaded = convert_state_dict(sd, params, state)
    expect_n = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert n_loaded == expect_n, "every torch tensor must map onto our params"

    got = [np.asarray(o) for o in M.apply(params, state, x, spec)]
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-3)


def test_bisenet_fold(rng):
    """Automated BN folding works for the ablation too (no s2d stem)."""
    from pidnet_tpu.convert import fold_params

    spec = bisenet.spec_for("bisenet_adb_bag", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(3), spec)
    state = {
        k: (np.abs(np.asarray(v)) + 0.5 if "var" in k else np.asarray(v) + 0.1)
        for k, v in state.items()
    }
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    want = np.asarray(M.apply(params, state, x, spec))
    folded = fold_params(params, state, spec)
    got = np.asarray(M.apply(folded, {}, x, spec, folded=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_bisenet_trains_through_generic_step(rng):
    """4-output aux mode ([aux16, aux32, final, boundary]) fits FullLoss
    with 3 balance weights; the generic shard_map step runs unmodified."""
    from pidnet_tpu.losses import FullLoss
    from pidnet_tpu.parallel import make_mesh, shard_batch
    from pidnet_tpu.train import TrainState, make_train_step

    mesh = make_mesh(2)
    spec = bisenet.spec_for("bisenet_adb_bag", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    loss_fn = FullLoss(
        num_outputs=3, balance_weights=(0.4, 0.4, 1.0),
        ignore_label=255, ohem_kept=500,
    )
    step = make_train_step(spec, loss_fn, mesh, stem_s2d=False)
    ts = TrainState.create(params, state)

    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    lab = rng.integers(0, 19, (2, 64, 64)).astype(np.int32)
    edge = (rng.random((2, 64, 64)) < 0.1).astype(np.float32)
    before = np.asarray(ts.params["sp.conv1.conv.weight"]).copy()
    ts, metrics = step(ts, *shard_batch(mesh, img, lab, edge), 0.01)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(ts.params["sp.conv1.conv.weight"]), before)
