"""Full-resolution (1024x2048) parity on the real bundled sample images.

Round-1 parity ran only at 64x128 toy shapes; these tests re-establish it
at deployment resolution, where the resize matrices (ops/resize.py), the
space-to-depth stem, and the eval inference path (OUTPUT_INDEX pick,
align_corners=True upsample, .exp() — reference base_dataset.py:136-150)
actually run. Also bounds the *benchmarked* configuration: bench.py
measures folded + s2d + bf16, so that exact path must agree with the fp32
parity path on argmax predictions (reference analogue: the hand-edited
BN-free speed copy is implicitly assumed prediction-identical,
models/speed/pidnet_speed.py:230-271).

Uses /root/reference/samples/frankfurt_*.png (the only in-repo data) and
a randomized torch reference net as the oracle, like tests/test_parity.py.
"""

import sys
import types

import numpy as np
import pytest
import torch

from tests.conftest import REFERENCE_ROOT, reference_available
from tests.test_parity import _randomized_torch_model

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

from pidnet_tpu.convert import convert_state_dict, fold_params  # noqa: E402
from pidnet_tpu.data.transforms import input_transform  # noqa: E402
from pidnet_tpu.models import pidnet as M  # noqa: E402

SAMPLE = (
    REFERENCE_ROOT + "/samples/frankfurt_000000_002196_leftImg8bit.png"
)


@pytest.fixture(scope="module")
def fullres():
    """Shared full-res fixtures: normalized sample image, randomized torch
    oracle, converted JAX params, and both nets' raw outputs."""
    import cv2
    import jax

    img = cv2.imread(SAMPLE)
    assert img is not None and img.shape == (1024, 2048, 3)
    x = input_transform(img, bgr_to_rgb=True)[None]  # NHWC f32

    net, sd = _randomized_torch_model("pidnet_s", 19, augment=True, seed=7)
    with torch.no_grad():
        want = net(torch.from_numpy(x).permute(0, 3, 1, 2))

    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    params, state, _ = convert_state_dict(sd, params, state)
    got = [np.asarray(o) for o in M.apply(params, state, x, spec)]
    return types.SimpleNamespace(
        x=x, net=net, spec=spec, params=params, state=state,
        want=want, got=got,
    )


def test_fullres_logit_parity(fullres):
    """All three heads match at 1024x2048 (reference eval resolution,
    tools/eval.py:104-121); final-head argmax agrees everywhere."""
    want = [o.permute(0, 2, 3, 1).numpy() for o in fullres.want]
    assert len(fullres.got) == 3
    for g, w in zip(fullres.got, want):
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=2e-3)
    agree = np.mean(
        np.argmax(fullres.got[-2], -1) == np.argmax(want[-2], -1)
    )
    assert agree == 1.0, f"full-res argmax agreement {agree:.6f} != 1"


def test_fullres_inference_path_parity(fullres):
    """engine.make_inference == reference BaseDataset.inference at full res:
    OUTPUT_INDEX pick, align_corners=True bilinear to input size, .exp()
    (base_dataset.py:136-150). Covers ops/resize.py at deployment sizes."""
    import jax

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from datasets.base_dataset import BaseDataset  # type: ignore

    cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(NUM_OUTPUTS=2, ALIGN_CORNERS=True),
        TEST=types.SimpleNamespace(OUTPUT_INDEX=1),
        TRAIN=types.SimpleNamespace(IGNORE_LABEL=255),
    )
    with torch.no_grad():
        want = BaseDataset.inference(
            None, cfg, fullres.net, torch.from_numpy(fullres.x).permute(0, 3, 1, 2)
        )
    want = want.permute(0, 2, 3, 1).numpy()  # (1,1024,2048,19) exp'd probs

    from pidnet_tpu import engine

    infer = engine.make_inference(cfg, fullres.spec, fullres.params, fullres.state)
    got = np.asarray(infer(jax.numpy.asarray(fullres.x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
    agree = np.mean(np.argmax(got, -1) == np.argmax(want, -1))
    assert agree == 1.0, f"inference argmax agreement {agree:.6f} != 1"


def test_bench_path_accuracy_bound(fullres):
    """The exact benchmarked configuration (folded BN + s2d stem + bf16,
    bench.py:31-36) must agree with the fp32 parity path on >=99.5% of
    argmax pixels at 1024x2048 — the guard that keeps the FPS numbers
    honest. The intermediate folded+s2d fp32 step must match to fp noise."""
    import jax
    import jax.numpy as jnp

    spec = M.spec_for("pidnet_s", 19, augment=False)
    net, sd = _randomized_torch_model("pidnet_s", 19, augment=False, seed=7)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    params, state, _ = convert_state_dict(sd, params, state)

    ref = np.asarray(M.apply(params, state, fullres.x, spec))
    ref_pred = np.argmax(ref, -1)

    folded = fold_params(params, state, spec)
    f32 = np.asarray(M.apply(folded, {}, fullres.x, spec, folded=True, stem_s2d=True))
    np.testing.assert_allclose(f32, ref, rtol=5e-3, atol=5e-3)

    bf16 = np.asarray(
        M.apply(
            folded, {}, fullres.x.astype(np.float32), spec,
            folded=True, compute_dtype=jnp.bfloat16, stem_s2d=True,
        ).astype(jnp.float32)
    )
    agree = float(np.mean(np.argmax(bf16, -1) == ref_pred))
    print(f"\nbench-path (folded+s2d+bf16) argmax agreement vs fp32: {agree:.6f}")
    assert agree >= 0.995, f"bf16 bench path agreement {agree:.6f} < 0.995"
