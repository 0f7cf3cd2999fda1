"""Freeze golden class-maps for the bundled Frankfurt frames.

The reference's correctness story is published mIoU reproduced from
released checkpoints (reference README.md:62-71) — data and weights this
environment doesn't have. The in-repo substitute is a frozen full-model
regression artifact: the fp32 parity pipeline's argmax class maps on the
two bundled Cityscapes frames (samples/), from a DETERMINISTIC seed-0
initialization — any silent numerical change anywhere in the model
pipeline shifts decision boundaries and breaks agreement
(tests/test_goldens.py gates at 99.5%).

With real weights present, pass a checkpoint to freeze REAL goldens too:

    python scripts/make_goldens.py                       # seed-0 goldens
    python scripts/make_goldens.py PIDNet_S_Cityscapes_test.pt  # + real

Artifacts land in tests/goldens/classmaps_{seed0,real}.npz (int8 class
maps at 1024x2048, ~60 KB compressed each). Runs on CPU for
platform-independence (fp32 Precision.HIGHEST parity path).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # the axon sitecustomize
# registers the TPU backend at interpreter start; env var alone is not
# enough (tests/conftest.py) — goldens must be platform-independent CPU
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAMES = [
    "frankfurt_000000_002196_leftImg8bit.png",
    "frankfurt_000000_003025_leftImg8bit.png",
]


def load_frame(name: str) -> np.ndarray:
    import cv2

    img = cv2.imread(os.path.join(REPO, "samples", name))
    assert img is not None, name
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (img.astype(np.float32)[:, :, ::-1] / 255.0 - mean) / std
    return np.ascontiguousarray(x)[None]


def class_maps(params, state, spec) -> dict:
    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.ops.resize import resize_bilinear

    @jax.jit
    def infer(x):
        out = M.apply(params, state, x, spec, train=False)[1]
        pred = resize_bilinear(out, (x.shape[1], x.shape[2]), True)
        return jnp.argmax(pred, axis=-1).astype(jnp.int8)

    return {
        name: np.asarray(infer(jnp.asarray(load_frame(name))))[0]
        for name in FRAMES
    }


def main():
    from pidnet_tpu.models import pidnet as M

    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)

    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    maps = class_maps(params, state, spec)
    path = os.path.join(out_dir, "classmaps_seed0.npz")
    np.savez_compressed(path, **maps)
    print(f"wrote {path}")

    trained = os.path.join(REPO, "runs", "train2k", "weights_f16.npz")
    if os.path.exists(trained):
        # trained-weights goldens: REAL decision boundaries (the train2k
        # released-checkpoint stand-in), a stronger regression anchor
        # than the random-init maps
        import jax.numpy as jnp

        z = np.load(trained)
        tp = {k[2:]: jnp.asarray(z[k], jnp.float32) for k in z.files if k.startswith("p.")}
        ts_ = {k[2:]: jnp.asarray(z[k], jnp.float32) for k in z.files if k.startswith("s.")}
        maps = class_maps(tp, ts_, spec)
        path = os.path.join(out_dir, "classmaps_train2k.npz")
        np.savez_compressed(path, **maps)
        print(f"wrote {path}")

    if len(sys.argv) > 1:
        from pidnet_tpu.convert.torch_weights import load_torch_checkpoint

        params, state, _ = load_torch_checkpoint(sys.argv[1], params, state)
        maps = class_maps(params, state, spec)
        path = os.path.join(out_dir, "classmaps_real.npz")
        np.savez_compressed(path, **maps)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
