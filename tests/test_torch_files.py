"""Loading real torch-serialized checkpoint files from disk, both reference
layouts (.pth.tar with 'state_dict' key; .pt with 'model.' prefix)."""

import numpy as np
import torch

import jax

from pidnet_tpu.models import pidnet as M
from pidnet_tpu.tools.common import load_weights

SPEC = M.spec_for("pidnet_s", 11, augment=True)


def _torch_style_sd(params, state, prefix=""):
    sd = {}
    for k, v in {**params, **state}.items():
        arr = np.asarray(v)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        sd[prefix + k] = torch.from_numpy(arr.copy())
    return sd


def test_pth_tar_with_state_dict_key(tmp_path):
    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    path = str(tmp_path / "imagenet.pth.tar")
    torch.save({"state_dict": _torch_style_sd(params, state)}, path)
    p0, s0 = M.init(jax.random.PRNGKey(9), SPEC)
    p, s, n = load_weights(path, p0, s0)
    assert n == len(params) + len(state)
    np.testing.assert_allclose(
        np.asarray(p["conv1.0.weight"]), np.asarray(params["conv1.0.weight"])
    )


def test_pt_with_model_prefix_and_shape_filter(tmp_path):
    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    sd = _torch_style_sd(params, state, prefix="model.")
    # a shape-mismatched head (different num_classes) must be skipped, not fail
    sd["model.final_layer.conv2.weight"] = torch.zeros(19, 128, 1, 1)
    sd["model.final_layer.conv2.bias"] = torch.zeros(19)
    path = str(tmp_path / "finetuned.pt")
    torch.save(sd, path)
    p0, s0 = M.init(jax.random.PRNGKey(9), SPEC)
    p, s, n = load_weights(path, p0, s0)
    assert n == len(params) + len(state) - 2  # tolerant strict=False merge
    # the mismatched head keeps its fresh init
    np.testing.assert_allclose(
        np.asarray(p["final_layer.conv2.bias"]), np.asarray(p0["final_layer.conv2.bias"])
    )


def test_convert_cli_roundtrip(tmp_path):
    """tools/convert.py: torch .pt -> native .msgpack, --fold, and --export
    back to torch layout, all preserving the weights."""
    from pidnet_tpu.tools import convert as convert_tool
    from pidnet_tpu.train.checkpoint import load_model

    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    src = str(tmp_path / "ft.pt")
    torch.save(_torch_style_sd(params, state, prefix="model."), src)

    # torch -> native
    dst = str(tmp_path / "native.msgpack")
    convert_tool.main(["--a", "pidnet-s", "--c", "11", src, dst])
    p2, s2 = load_model(dst)
    np.testing.assert_allclose(
        np.asarray(p2["conv1.0.weight"]), np.asarray(params["conv1.0.weight"])
    )
    assert set(s2) == set(state)

    # torch -> folded native (BN-free inference params)
    fdst = str(tmp_path / "folded.msgpack")
    convert_tool.main(["--a", "pidnet-s", "--c", "11", "--fold", src, fdst])
    pf, sf = load_model(fdst)
    assert sf == {} and any(k.endswith(".scale") or k.endswith(".bias") for k in pf)

    # native -> torch layout (reference get_seg_model-compatible keys)
    tdst = str(tmp_path / "export.pt")
    convert_tool.main(["--a", "pidnet-s", "--c", "11", "--export", dst, tdst])
    sd = torch.load(tdst, weights_only=True)
    assert all(k.startswith("model.") for k in sd)
    w = sd["model.conv1.0.weight"].numpy()  # OIHW
    np.testing.assert_allclose(
        np.transpose(w, (2, 3, 1, 0)), np.asarray(params["conv1.0.weight"])
    )


def test_folded_checkpoint_routing(tmp_path):
    """A --fold output is tagged `folded: true` and can only drive the
    folded apply path (ADVICE r2): load_weights refuses it instead of
    silently merging BN-baked conv weights into an unfolded init, and
    load_folded returns the folded parameter set verbatim."""
    import pytest

    from pidnet_tpu.convert import fold_params
    from pidnet_tpu.tools import common, convert as convert_tool

    params, state = M.init(jax.random.PRNGKey(0), SPEC)
    src = str(tmp_path / "ft.pt")
    torch.save(_torch_style_sd(params, state, prefix="model."), src)
    fdst = str(tmp_path / "folded.msgpack")
    convert_tool.main(["--a", "pidnet-s", "--c", "11", "--fold", src, fdst])

    assert common.is_folded_checkpoint(fdst)
    with pytest.raises(SystemExit, match="BN-folded"):
        load_weights(fdst, dict(params), dict(state))
    pf = common.load_folded(fdst, SPEC, params, state)
    want = fold_params(params, state, SPEC)
    assert set(pf) == set(want)
    np.testing.assert_allclose(
        np.asarray(pf["conv1.0.weight"]), np.asarray(want["conv1.0.weight"])
    )
    # converting an already-folded src is refused up front
    with pytest.raises(SystemExit, match="BN-folded"):
        convert_tool.main(["--a", "pidnet-s", "--c", "11", fdst,
                           str(tmp_path / "x.msgpack")])
    # a wrong-architecture load aborts instead of writing random init
    with pytest.raises(SystemExit, match="matched only"):
        convert_tool.main(["--a", "pidnet-l", "--c", "11", src,
                           str(tmp_path / "y.msgpack")])
