"""Evaluation CLI — same UX as the reference tools/eval.py:

    python -m pidnet_tpu.tools.eval --cfg configs/cityscapes/pidnet_small_cityscapes.yaml \
        [TEST.MODEL_FILE path.{msgpack,pt}]

Dispatch (reference tools/eval.py:104): Cityscapes test split -> submission
writer; otherwise labeled single-scale eval reporting mIoU / per-class
IoU / pixel acc / mean acc.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp

from pidnet_tpu.config import load_config
from pidnet_tpu import engine
from pidnet_tpu.data import Loader, build_dataset
from pidnet_tpu.tools import common
from pidnet_tpu.utils import create_logger


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Eval segmentation network")
    parser.add_argument(
        "--cfg",
        default="configs/cityscapes/pidnet_small_cityscapes.yaml",
        type=str,
    )
    parser.add_argument(
        "--fold-bn",
        action="store_true",
        help="fold BatchNorm into convs (speed path); compute dtype is then "
        "governed by XLA.BF16_INFERENCE (bf16 by default)",
    )
    parser.add_argument(
        "--spatial",
        type=int,
        default=0,
        metavar="N",
        help="shard the image H dim over N devices (GSPMD spatial "
        "partitioning, parallel/spatial.py) — for resolutions that exceed "
        "one chip's HBM; 0 = single-device inference",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.cfg, args.opts)
    logger, final_output_dir, _ = create_logger(cfg, args.cfg, "test")
    logger.info("%s", cfg)

    spec = common.build_spec(cfg, augment=True)
    params, state = common.init_model(cfg, spec)
    params, state = common.maybe_load_pretrained(cfg, params, state)

    if cfg.TEST.MODEL_FILE:
        model_file = cfg.TEST.MODEL_FILE
    else:
        model_file = os.path.join(final_output_dir, "best.msgpack")
    logger.info("=> loading model from %s", model_file)
    if common.is_folded_checkpoint(model_file):
        # pre-folded payload (tools.convert --fold): its conv weights have
        # BN baked in, so it can only drive the folded apply path
        if not args.fold_bn:
            raise SystemExit(
                f"{model_file} is BN-folded (inference-only); re-run with "
                "--fold-bn to use it, or point TEST.MODEL_FILE at an "
                "unfolded checkpoint."
            )
        params, state = common.load_folded(model_file, spec, params, state), {}
    else:
        params, state, _ = common.load_weights(model_file, params, state)
        if args.fold_bn:
            from pidnet_tpu.convert import fold_params

            params, state = fold_params(params, state, spec), {}

    test_size = (cfg.TEST.IMAGE_SIZE[1], cfg.TEST.IMAGE_SIZE[0])
    test_dataset = build_dataset(
        cfg.DATASET.DATASET,
        root=cfg.DATASET.ROOT,
        list_path=cfg.DATASET.TEST_SET,
        num_classes=cfg.DATASET.NUM_CLASSES,
        multi_scale=False,
        flip=False,
        ignore_label=cfg.TRAIN.IGNORE_LABEL,
        base_size=cfg.TEST.BASE_SIZE,
        crop_size=test_size,
    )
    spatial_mesh = None
    data_mesh = None
    tta = bool(cfg.TEST.MULTI_SCALE or cfg.TEST.FLIP_TEST)
    if args.spatial:
        from pidnet_tpu.parallel.spatial import make_mesh_2d

        spatial_mesh = make_mesh_2d(1, args.spatial)
        logger.info("=> spatial partitioning: H dim over %d devices", args.spatial)
    elif not tta:
        # mesh-parallel offline eval (beyond the reference's single-GPU
        # batch-1 loop, tools/eval.py:94-99): shard the batch dim over the
        # data mesh — one image per device per call, tail batches padded
        # by engine.testval/test, metrics exact
        import jax

        from pidnet_tpu.parallel import make_mesh

        n_dev = cfg.DEVICES if cfg.DEVICES not in (-1, 0, None) else len(jax.devices())
        if n_dev > 1:
            data_mesh = make_mesh(n_dev)
            logger.info("=> data-parallel eval over %d devices", n_dev)

    batch_pad = data_mesh.devices.size if data_mesh is not None else 1
    testloader = Loader(test_dataset, max(1, batch_pad), shuffle=False, num_workers=0)

    if cfg.TEST.MULTI_SCALE or cfg.TEST.FLIP_TEST:
        # test-time augmentation: summed multi-scale (+flip-averaged)
        # probabilities — argmax of a SUM is not per-program argmax, so
        # this path always returns probability maps (no classmap kernel)
        if args.spatial:
            raise SystemExit(
                "TEST.MULTI_SCALE/FLIP_TEST is a single-device TTA protocol; "
                "drop --spatial or disable the TTA flags"
            )
        logger.info(
            "=> TTA eval: scales %s, flip=%s",
            cfg.TEST.SCALE_LIST if cfg.TEST.MULTI_SCALE else [1.0],
            bool(cfg.TEST.FLIP_TEST),
        )
        infer = engine.make_ms_flip_inference(
            cfg,
            spec,
            params,
            state,
            folded=args.fold_bn,
            compute_dtype=(
                jnp.bfloat16 if (args.fold_bn and cfg.XLA.BF16_INFERENCE) else None
            ),
        )
    else:
        # speed path: class-map inference (fused upsample+argmax, no full-res
        # logits); parity path: exp'd full-res probabilities like the reference
        make = engine.make_inference_classmap if args.fold_bn else engine.make_inference
        infer = make(
            cfg,
            spec,
            params,
            state,
            folded=args.fold_bn,
            compute_dtype=(
                jnp.bfloat16 if (args.fold_bn and cfg.XLA.BF16_INFERENCE) else None
            ),
            spatial_mesh=spatial_mesh,
            data_mesh=data_mesh,
            # offline eval weights are frozen: bake them as jit constants so
            # per-call weight prep (casts, s2d/wfold expansions) folds away
            bake=spatial_mesh is None and data_mesh is None,
        )

    if "test" in cfg.DATASET.TEST_SET and "city" in cfg.DATASET.DATASET:
        engine.test(
            cfg, test_dataset, testloader, infer, sv_dir=final_output_dir,
            batch_pad=batch_pad,
        )
    else:
        mean_iou, iou_array, pixel_acc, mean_acc = engine.testval(
            cfg, test_dataset, testloader, infer, sv_dir=final_output_dir,
            batch_pad=batch_pad,
        )
        logger.info(
            "MeanIU: %.4f, Pixel_Acc: %.4f, Mean_Acc: %.4f", mean_iou, pixel_acc, mean_acc
        )
        logger.info("%s", iou_array)


if __name__ == "__main__":
    main()
