"""Custom-image inference CLI — same UX as the reference tools/custom.py:

    python -m pidnet_tpu.tools.custom --a pidnet-s --p weights.pt --r samples/ --t .png

Loads any ``*.t`` images under ``--r``, runs the single-output pred model,
upsamples logits to input size with align_corners=True (reference
custom.py:93), argmaxes, colorizes with the Cityscapes palette, and writes
to ``<r>/outputs/``.
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pidnet_tpu.data.transforms import input_transform
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.resize import resize_bilinear
from pidnet_tpu.tools import common

COLOR_MAP = [
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
    (0, 0, 230), (119, 11, 32),
]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Custom Input")
    parser.add_argument("--a", default="pidnet-l", help="pidnet-s, pidnet-m or pidnet-l")
    parser.add_argument("--c", type=bool, default=True, help="cityscapes pretrained or not")
    parser.add_argument(
        "--p",
        default="pretrained_models/cityscapes/PIDNet_L_Cityscapes_test.pt",
        help="dir for pretrained model",
    )
    parser.add_argument("--r", default="samples/", help="root or dir for input images")
    parser.add_argument("--t", default=".png", help="input image format")
    parser.add_argument("--bf16", action="store_true", help="folded-BN bf16 speed path")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    images_list = glob.glob(args.r + "*" + args.t)
    sv_path = os.path.join(args.r, "outputs")

    spec = M.spec_for(args.a, 19 if args.c else 11, augment=False)
    params, state = M.init(jax.random.PRNGKey(0), spec)
    folded = False
    if common.is_folded_checkpoint(args.p):
        # pre-folded payload (tools.convert --fold) -> folded apply path
        if not args.bf16:
            raise SystemExit(
                f"{args.p} is BN-folded (inference-only); re-run with --bf16 "
                "to use it, or point --p at an unfolded checkpoint."
            )
        params, state, folded = common.load_folded(args.p, spec, params, state), {}, True
    else:
        params, state, _ = common.load_weights(args.p, params, state)
        if args.bf16:
            from pidnet_tpu.convert import fold_params

            params, state, folded = fold_params(params, state, spec), {}, True

    @jax.jit
    def infer(x):
        # same folded pipeline as engine.make_inference*/bench (s2d stem +
        # W-folded branch stages)
        pred = M.apply(
            params, state, x, spec, folded=folded,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
            stem_s2d=folded, wfold=folded,
        )
        if args.bf16:  # fused Pallas upsample+argmax on the speed path
            from pidnet_tpu.ops.upsample_argmax import upsample_argmax

            return upsample_argmax(pred, (x.shape[1], x.shape[2]), True)
        pred = resize_bilinear(pred, (x.shape[1], x.shape[2]), True)
        return jnp.argmax(pred, axis=-1)

    palette = np.array(COLOR_MAP, np.uint8)
    os.makedirs(sv_path, exist_ok=True)
    for img_path in images_list:
        img_name = os.path.basename(img_path)
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        x = input_transform(img, bgr_to_rgb=True)[None]
        pred = np.asarray(infer(jnp.asarray(x)))[0]
        sv_img = palette[pred]
        Image.fromarray(sv_img).save(os.path.join(sv_path, img_name))
        print(f"wrote {os.path.join(sv_path, img_name)}")


if __name__ == "__main__":
    main()
