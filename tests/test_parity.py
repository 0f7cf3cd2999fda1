"""Logit parity vs the reference PyTorch implementation.

The reference repo (read-only, /root/reference) is imported as an oracle:
we randomize a full torch state_dict, run the torch net in eval mode, convert
the same weights with `pidnet_tpu.convert`, and require matching logits for
all three outputs. This covers hard-part #1/#6 from SURVEY.md §7 (mixed
align_corners semantics; checkpoint-format fidelity) end to end.
"""

import sys

import numpy as np
import pytest
import torch

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

from pidnet_tpu.convert import convert_state_dict, fold_params  # noqa: E402
from pidnet_tpu.models import pidnet as M  # noqa: E402


def _reference_module():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.pidnet as ref_pidnet  # type: ignore

    return ref_pidnet


def _randomized_torch_model(name: str, num_classes: int, augment: bool, seed: int):
    ref = _reference_module()
    torch.manual_seed(seed)
    if name == "pidnet_s":
        net = ref.PIDNet(2, 3, num_classes, 32, 96, 128, augment)
    elif name == "pidnet_m":
        net = ref.PIDNet(2, 3, num_classes, 64, 96, 128, augment)
    else:
        net = ref.PIDNet(3, 4, num_classes, 64, 112, 256, augment)
    # Randomize every tensor (incl. BN affine + running stats) so the parity
    # check exercises non-trivial statistics, not just the init values.
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


@pytest.mark.parametrize("name", ["pidnet_s", "pidnet_m", "pidnet_l"])
def test_logit_parity(name, rng):
    num_classes = 19
    net, sd = _randomized_torch_model(name, num_classes, augment=True, seed=7)
    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = [o.permute(0, 2, 3, 1).numpy() for o in want]

    spec = M.spec_for(name, num_classes, augment=True)
    import jax

    params, state = M.init(jax.random.PRNGKey(0), spec)
    params, state, n_loaded = convert_state_dict(sd, params, state)
    expect_n = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert n_loaded == expect_n, "every torch tensor must map onto our params"

    got = M.apply(params, state, np.asarray(x)[None][0:1].reshape(1, 64, 128, 3), spec)
    got = [np.asarray(o) for o in got]
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-4)


def test_pred_model_parity(rng):
    """augment=False single-output path (reference pidnet.py:218-227)."""
    net, sd = _randomized_torch_model("pidnet_s", 11, augment=False, seed=11)
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    spec = M.spec_for("pidnet_s", 11, augment=False)
    import jax

    params, state = M.init(jax.random.PRNGKey(0), spec)
    params, state, _ = convert_state_dict(sd, params, state)
    got = np.asarray(M.apply(params, state, np.asarray(x), spec))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_folded_inference_matches(rng):
    """BN folding (automated speed-model equivalent) preserves outputs,
    with and without the space-to-depth stem."""
    import jax

    spec = M.spec_for("pidnet_s", 19, augment=False)
    params, state = M.init(jax.random.PRNGKey(3), spec)
    # non-trivial running stats
    state = {
        k: (np.abs(np.asarray(v)) + 0.5 if "var" in k else np.asarray(v) + 0.1)
        for k, v in state.items()
    }
    x = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    want = np.asarray(M.apply(params, state, x, spec))
    folded = fold_params(params, state, spec)
    got = np.asarray(M.apply(folded, {}, x, spec, folded=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # deep-s2d stem is mathematically identical to the folded stem
    got_s2d = np.asarray(M.apply(folded, {}, x, spec, folded=True, stem_s2d=True))
    np.testing.assert_allclose(got_s2d, got, rtol=1e-5, atol=1e-6)
    # folded + W-folded branch stages (the engine inference combination:
    # tiled folded biases + masked ReLU mid layout, no BN) is the same math
    got_wf = np.asarray(
        M.apply(folded, {}, x, spec, folded=True, stem_s2d=True, wfold=True)
    )
    np.testing.assert_allclose(got_wf, got, rtol=1e-4, atol=1e-4)


def test_export_loads_into_reference_get_seg_model(tmp_path, rng):
    """True torch interop: a checkpoint written by `export_state_dict` loads
    through the ACTUAL reference loader (`get_seg_model`'s `.pt` branch with
    the `k[6:]` model-prefix strip, models/pidnet.py:204-214) and the torch
    net then reproduces our logits."""
    import types

    import jax

    from pidnet_tpu.convert.torch_weights import export_state_dict

    ref = _reference_module()
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(21), spec)
    # non-trivial BN stats so the merge is actually observable
    state = {
        k: (np.abs(np.asarray(v)) + 0.5 if "var" in k else np.asarray(v) + 0.1)
        for k, v in state.items()
    }

    path = str(tmp_path / "exported.pt")
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in export_state_dict(params, state).items()},
        path,
    )
    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NAME="pidnet_s", PRETRAINED=path),
        DATASET=types.SimpleNamespace(NUM_CLASSES=19),
    )
    net = ref.get_seg_model(cfg, imgnet_pretrained=False).eval()

    # every exported tensor must actually have been merged (not left at the
    # torch net's fresh init): compare a conv and a BN running stat
    got_w = net.state_dict()["conv1.0.weight"].numpy()
    want_w = np.transpose(np.asarray(params["conv1.0.weight"]), (3, 2, 0, 1))
    np.testing.assert_allclose(got_w, want_w, atol=1e-7)
    np.testing.assert_allclose(
        net.state_dict()["layer1.0.bn1.running_var"].numpy(),
        np.asarray(state["layer1.0.bn1.running_var"]),
        atol=1e-7,
    )

    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = [o.permute(0, 2, 3, 1).numpy() for o in want]
    got = [np.asarray(o) for o in M.apply(params, state, x, spec)]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=5e-4)


def test_model_prefix_strip(rng):
    """Finetuned `.pt` checkpoints carry a FullModel `model.` prefix
    (reference tools/custom.py:64)."""
    import jax

    net, sd = _randomized_torch_model("pidnet_s", 19, augment=True, seed=5)
    prefixed = {"model." + k: v for k, v in sd.items()}
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    _, _, n_loaded = convert_state_dict(prefixed, params, state)
    expect_n = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert n_loaded == expect_n
