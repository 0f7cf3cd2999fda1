"""Block-level parity for paths stock PIDNet doesn't exercise:
PagFM with_channel/after_relu (reference model_utils.py:381-388 smoke),
DDFMv2, and segmenthead's scale_factor upsample."""

import sys

import numpy as np
import pytest
import torch

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

import jax.numpy as jnp  # noqa: E402

from pidnet_tpu.models import pidnet as M  # noqa: E402


def _ref_models():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.model_utils as mu  # type: ignore

    return mu


def _params_from_torch(module, prefix=""):
    params, state = {}, {}
    for k, v in module.state_dict().items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = v.detach().numpy().astype(np.float32)
        if arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))
        target = state if "running_" in k else params
        target[prefix + k] = jnp.asarray(arr)
    return params, state


def _apply_ops(params, state):
    return M._ApplyOps(
        params, state, train=False, sync_axis=None, compute_dtype=None, folded=False
    )


def _randomize(module, seed):
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.3
    module.load_state_dict(sd)
    module.eval()
    return module


@pytest.mark.parametrize("with_channel,after_relu", [(True, False), (False, True), (True, True)])
def test_pagfm_flags(rng, with_channel, after_relu):
    mu = _ref_models()
    net = _randomize(mu.PagFM(64, 16, after_relu=after_relu, with_channel=with_channel), 3)
    x = rng.standard_normal((2, 16, 24, 64), dtype=np.float32)
    y = rng.standard_normal((2, 8, 12, 64), dtype=np.float32)
    with torch.no_grad():
        want = net(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
    params, state = _params_from_torch(net, "pag.")
    got = np.asarray(
        M._pagfm(
            _apply_ops(params, state), "pag", jnp.asarray(x), jnp.asarray(y), 16,
            after_relu=after_relu, with_channel=with_channel,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddfm_v2(rng):
    mu = _ref_models()
    net = _randomize(mu.DDFMv2(64, 64), 5)
    p = rng.standard_normal((1, 16, 16, 64), dtype=np.float32)
    i = rng.standard_normal((1, 16, 16, 64), dtype=np.float32)
    d = rng.standard_normal((1, 16, 16, 64), dtype=np.float32)
    with torch.no_grad():
        want = net(
            *(torch.from_numpy(a).permute(0, 3, 1, 2) for a in (p, i, d))
        ).permute(0, 2, 3, 1).numpy()
    params, state = _params_from_torch(net, "dfm.")
    got = np.asarray(
        M._ddfm_v2(
            _apply_ops(params, state), "dfm",
            jnp.asarray(p), jnp.asarray(i), jnp.asarray(d), 64,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_segmenthead_scale_factor(rng):
    mu = _ref_models()
    net = _randomize(mu.segmenthead(32, 64, 19, scale_factor=8), 7)
    x = rng.standard_normal((1, 8, 12, 32), dtype=np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    params, state = _params_from_torch(net, "head.")
    got = np.asarray(
        M._segmenthead(
            _apply_ops(params, state), "head", jnp.asarray(x), 64, 19, scale_factor=8
        )
    )
    assert got.shape == (1, 64, 96, 19)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
