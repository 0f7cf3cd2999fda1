"""Training CLI — same UX as the reference tools/train.py:

    python -m pidnet_tpu.tools.train --cfg configs/cityscapes/pidnet_small_cityscapes.yaml [KEY VALUE ...]

Differences (TPU-native): the device pool is a 1-D `data` mesh
(cfg.DEVICES, -1 = all chips) instead of cfg.GPUS; global batch =
TRAIN.BATCH_SIZE_PER_GPU x mesh size, matching the reference's
per-GPU-batch x n-GPUs (tools/train.py:82,152).
"""

from __future__ import annotations

import argparse
import os
import signal
import timeit

import numpy as np

from pidnet_tpu.config import load_config
from pidnet_tpu import engine
from pidnet_tpu.data import Loader, build_dataset
from pidnet_tpu.losses import FullLoss
from pidnet_tpu.parallel import make_mesh
from pidnet_tpu.tools import common
from pidnet_tpu.train import TrainState, checkpoint as ckpt, make_eval_step, make_train_step
from pidnet_tpu.utils import TBWriter, create_logger


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train segmentation network")
    parser.add_argument(
        "--cfg",
        default="configs/cityscapes/pidnet_small_cityscapes.yaml",
        type=str,
        help="experiment configure file name",
    )
    parser.add_argument(
        "--seed",
        type=int,
        default=None,
        help="RNG seed; default = cfg.SEED (304, like the reference "
        "tools/train.py:37)",
    )
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() for multi-host TPU slices; "
        "the same mesh program then spans hosts over DCN",
    )
    parser.add_argument(
        "--spatial",
        type=int,
        default=0,
        metavar="N",
        help="also shard the image H dim over N devices per data shard "
        "(GSPMD spatial partitioning, parallel/spatial.py) — for crops "
        "that exceed one chip's HBM. Semantics are global-batch (sync-BN "
        "+ global OHEM; spatial shards of one image must share "
        "statistics). 0 = pure data parallelism",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # Graceful preemption (beyond-reference; the reference only has
    # crash-resume, SURVEY §5): TPU VMs are routinely preempted with a
    # SIGTERM grace window. Install the flag-only handler FIRST so the
    # grace window is honored even when the signal lands during the long
    # first-compile/dataset-build phase (nothing checkpointable exists
    # yet, but the default handler would hard-kill mid-grace); the epoch
    # loop polls the flag at step boundaries.
    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        # flag only — logging here could re-enter a non-reentrant stream
        # writer if the signal lands mid-emit on the main thread; the epoch
        # loop logs the stop at the next step boundary instead
        stop_requested["flag"] = True

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. embedded use) — skip
        prev_sigterm = None

    import jax

    if args.multihost:
        jax.distributed.initialize()
    cfg = load_config(args.cfg, args.opts)
    seed = args.seed if args.seed is not None else int(cfg.SEED)

    logger, final_output_dir, tb_log_dir = create_logger(cfg, args.cfg, "train")
    logger.info("%s", cfg)

    np.random.seed(seed)

    writer_dict = {
        "writer": TBWriter(tb_log_dir),
        "train_global_steps": 0,
        "valid_global_steps": 0,
    }

    # device/process-count sanity (the reference asserts its GPU count the
    # same way before training, tools/train.py:75-77)
    n_proc = jax.process_count()
    if jax.device_count() != jax.local_device_count() * n_proc:
        raise RuntimeError(
            f"inconsistent device topology: {jax.device_count()} global != "
            f"{jax.local_device_count()} local x {n_proc} processes"
        )
    if args.multihost and n_proc < 2:
        logger.info("--multihost with a single process; continuing single-host")

    mesh = make_mesh(cfg.DEVICES)
    n_dev = mesh.devices.size
    if n_proc > 1 and n_dev % n_proc != 0:
        raise RuntimeError(
            f"mesh size {n_dev} must divide evenly over {n_proc} processes"
        )
    is_primary = jax.process_index() == 0
    logger.info(
        "data mesh over %d device(s), %d process(es), primary=%s",
        n_dev, n_proc, is_primary,
    )

    spatial_mesh = None
    n_data = n_dev  # data shards (= devices unless --spatial divides them)
    if args.spatial:
        from pidnet_tpu.parallel.spatial import make_mesh_2d

        if n_dev % args.spatial != 0:
            raise RuntimeError(
                f"--spatial {args.spatial} must divide the mesh size {n_dev}"
            )
        if n_proc > 1 and jax.local_device_count() % args.spatial != 0:
            # each process must own whole (data row × spatial) groups so
            # its local batch rows are process-local shards (put_batch)
            raise RuntimeError(
                f"--spatial {args.spatial} must divide the local device "
                f"count {jax.local_device_count()} under multi-process"
            )
        n_data = n_dev // args.spatial
        spatial_mesh = make_mesh_2d(n_data, args.spatial)
        logger.info(
            "spatial partitioning: (%d data, %d spatial) mesh, H dim sharded",
            n_data, args.spatial,
        )

    spec = common.build_spec(cfg, augment=True)
    params, state = common.init_model(cfg, spec, seed=seed)
    params, state = common.maybe_load_pretrained(cfg, params, state)

    accum = int(cfg.TRAIN.ACCUM_STEPS)
    if accum < 1:
        raise RuntimeError(f"TRAIN.ACCUM_STEPS must be >= 1, got {accum}")
    if accum > 1 and args.spatial:
        # the spatial step is one global-batch program (global OHEM pool,
        # sync-BN semantics) — sequential virtual DP shards don't compose
        # with it; shard more/larger devices instead
        raise RuntimeError("TRAIN.ACCUM_STEPS > 1 does not compose with --spatial")
    if accum > 1 and cfg.XLA.SYNC_BN:
        # sync-BN pmeans batch statistics over the PHYSICAL shards of each
        # sequential microbatch only — there is no collective across scan
        # iterations — so the result would NOT match a physical A x n-device
        # sync-BN mesh (the equivalence ACCUM_STEPS promises). Refuse rather
        # than silently train with different normalization semantics.
        raise RuntimeError(
            "TRAIN.ACCUM_STEPS > 1 does not compose with XLA.SYNC_BN: "
            "microbatches run sequentially, so BN stats cannot sync across "
            "them; use per-shard BN (default) or more physical devices"
        )

    # global batch = per-device x data-shard count x accumulation steps
    # (reference tools/train.py:82,152); each process loads its
    # rank-strided 1/n_proc
    batch_size = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_data * accum
    local_batch = batch_size // n_proc
    crop_size = (cfg.TRAIN.IMAGE_SIZE[1], cfg.TRAIN.IMAGE_SIZE[0])
    train_dataset = build_dataset(
        cfg.DATASET.DATASET,
        root=cfg.DATASET.ROOT,
        list_path=cfg.DATASET.TRAIN_SET,
        num_classes=cfg.DATASET.NUM_CLASSES,
        multi_scale=cfg.TRAIN.MULTI_SCALE,
        flip=cfg.TRAIN.FLIP,
        ignore_label=cfg.TRAIN.IGNORE_LABEL,
        base_size=cfg.TRAIN.BASE_SIZE,
        crop_size=crop_size,
        scale_factor=cfg.TRAIN.SCALE_FACTOR,
        seed=seed,
        cache=cfg.DATASET.CACHE,
        cache_gb=cfg.DATASET.CACHE_GB,
    )
    trainloader = Loader(
        train_dataset,
        local_batch,
        shuffle=cfg.TRAIN.SHUFFLE,
        drop_last=True,
        num_workers=cfg.WORKERS,
        seed=seed,
        num_shards=n_proc,
        shard_index=jax.process_index(),
    )

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
        seed=seed,
    )
    # validation shards the batch over the mesh — one sample per device
    # (1-D mesh) or per data row (--spatial: each sample's H spans the
    # spatial axis); engine.validate pads the final partial batch (masked
    # inert) so no image is dropped
    eval_batch = max(1, n_data // n_proc)
    testloader = Loader(
        test_dataset, eval_batch, shuffle=False, drop_last=False,
        num_workers=cfg.WORKERS, num_shards=n_proc,
        shard_index=jax.process_index(),
    )

    loss_fn = FullLoss(
        num_outputs=cfg.MODEL.NUM_OUTPUTS,
        align_corners=cfg.MODEL.ALIGN_CORNERS,
        ignore_label=cfg.TRAIN.IGNORE_LABEL,
        class_weights=train_dataset.class_weights,
        use_ohem=cfg.LOSS.USE_OHEM,
        ohem_thres=cfg.LOSS.OHEMTHRES,
        ohem_kept=cfg.LOSS.OHEMKEEP,
        balance_weights=cfg.LOSS.BALANCE_WEIGHTS,
        sb_weights=cfg.LOSS.SB_WEIGHTS,
    )

    if cfg.TRAIN.OPTIMIZER != "sgd":
        raise ValueError("Only Support SGD optimizer")

    import jax.numpy as jnp

    place_batch = None
    if spatial_mesh is not None:
        from functools import partial

        from pidnet_tpu.parallel.spatial import (
            make_spatial_eval_step,
            make_spatial_train_step,
            put_batch,
        )

        # the spatial steps are ONE global program (global OHEM pool), not
        # a per-shard criterion: scale the per-replica OHEMKEEP budget by
        # the data-shard count so each image keeps the same number of hard
        # pixels as the DP/reference per-replica criterion. The eval global
        # batch is also n_data samples (eval_batch = n_data // n_proc per
        # process), so the same budget applies to validation — an unscaled
        # budget would keep n_data x fewer hard pixels per image and
        # inflate valid_loss relative to non-spatial runs.
        spatial_loss_fn = FullLoss(
            num_outputs=cfg.MODEL.NUM_OUTPUTS,
            align_corners=cfg.MODEL.ALIGN_CORNERS,
            ignore_label=cfg.TRAIN.IGNORE_LABEL,
            class_weights=train_dataset.class_weights,
            use_ohem=cfg.LOSS.USE_OHEM,
            ohem_thres=cfg.LOSS.OHEMTHRES,
            ohem_kept=cfg.LOSS.OHEMKEEP * n_data,
            balance_weights=cfg.LOSS.BALANCE_WEIGHTS,
            sb_weights=cfg.LOSS.SB_WEIGHTS,
        )
        train_step = make_spatial_train_step(
            spec,
            spatial_loss_fn,
            spatial_mesh,
            momentum=cfg.TRAIN.MOMENTUM,
            weight_decay=cfg.TRAIN.WD,
            nesterov=cfg.TRAIN.NESTEROV,
            compute_dtype=jnp.bfloat16 if cfg.XLA.BF16_TRAIN else None,
        )
        # validation keeps H sharded too: the flag exists for resolutions
        # exceeding one chip's HBM, and TEST.IMAGE_SIZE is the largest
        # image in the run (round-2 advisor finding)
        eval_step = make_spatial_eval_step(
            spec,
            spatial_loss_fn,
            spatial_mesh,
            num_classes=cfg.DATASET.NUM_CLASSES,
            compute_dtype=jnp.bfloat16 if cfg.XLA.BF16_EVAL else None,
        )
        place_batch = partial(put_batch, spatial_mesh)
        place_eval_batch = place_batch
    else:
        train_step = make_train_step(
            spec,
            loss_fn,
            mesh,
            momentum=cfg.TRAIN.MOMENTUM,
            weight_decay=cfg.TRAIN.WD,
            nesterov=cfg.TRAIN.NESTEROV,
            sync_bn=cfg.XLA.SYNC_BN,
            compute_dtype=jnp.bfloat16 if cfg.XLA.BF16_TRAIN else None,
            pad_batch=cfg.XLA.PAD_BATCH,
            accum_steps=accum,
        )
        if accum > 1:
            from pidnet_tpu.parallel.mesh import shard_microbatches

            logger.info(
                "gradient accumulation: %d microbatches of %d = global batch %d",
                accum, batch_size // accum, batch_size,
            )
            place_batch = (
                lambda *arrays: shard_microbatches(mesh, accum, *arrays)
            )
        eval_step = make_eval_step(
            spec,
            loss_fn,
            mesh,
            num_classes=cfg.DATASET.NUM_CLASSES,
            compute_dtype=jnp.bfloat16 if cfg.XLA.BF16_EVAL else None,
            pad_batch=cfg.XLA.PAD_BATCH,
        )
        place_eval_batch = None

    ts = TrainState.create(params, state)

    # steps per epoch = this rank's actual batch count. Single-process this
    # IS the reference's len(ds)//global_batch (tools/train.py:152);
    # multi-process the loader wrap-pads ranks to equal counts
    # (DistributedSampler semantics), giving one more step than the global
    # formula — using the loader keeps the poly-LR schedule and the
    # Iter:[i/N] bookkeeping aligned with the steps that actually run.
    epoch_iters = len(trainloader)
    best_miou = 0.0
    last_epoch = 0
    resume_iter = 0  # completed steps within last_epoch (mid-epoch preemption)
    flag_rm = cfg.TRAIN.RESUME
    if cfg.TRAIN.RESUME:
        payload = ckpt.load_train_checkpoint(final_output_dir)
        if payload is not None:
            best_miou = payload["best_mIoU"]
            last_epoch = payload["epoch"]
            resume_iter = int(payload.get("iter", 0))
            ts = TrainState(payload["params"], payload["state"], payload["momentum"])
            if resume_iter:
                logger.info(
                    "=> loaded checkpoint (epoch %d, resuming mid-epoch at "
                    "iter %d)", last_epoch, resume_iter,
                )
            else:
                logger.info("=> loaded checkpoint (epoch %d)", last_epoch)

    start = timeit.default_timer()
    end_epoch = cfg.TRAIN.END_EPOCH
    num_iters = end_epoch * epoch_iters
    # CamVid trains 120 epochs regardless of END_EPOCH (reference
    # tools/train.py:172)
    real_end = 120 + 1 if "camvid" in cfg.DATASET.TRAIN_SET else end_epoch

    if cfg.XLA.PROFILE_DIR:
        import jax

        jax.profiler.start_trace(cfg.XLA.PROFILE_DIR)

    # Preemption semantics (handler installed at the top of main): the
    # epoch loop stops at the next step boundary, a resume checkpoint
    # tagged with the CURRENT epoch + completed-iteration count is
    # written, and the process exits cleanly. Multi-process: every
    # process must receive the signal (the norm for preemptions); a
    # process that misses it would block at the next collective.
    valid_loss, mean_iou, iou_array = float("nan"), 0.0, None
    for epoch in range(last_epoch, real_end):
        ts, done_iters = engine.train_one_epoch(
            cfg, epoch, epoch_iters, num_iters, cfg.TRAIN.LR,
            trainloader, train_step, ts, mesh, writer_dict,
            place_batch=place_batch,
            should_stop=lambda: stop_requested["flag"],
            start_iter=resume_iter if epoch == last_epoch else 0,
        )
        if stop_requested["flag"]:
            if cfg.XLA.PROFILE_DIR and epoch == last_epoch:
                import jax

                jax.profiler.stop_trace()  # flush the first-epoch trace
            # iteration-exact resume: record how far into the epoch the
            # interrupted run got; engine.train_one_epoch(start_iter=...)
            # replays the SAME (seed, epoch)-deterministic sample order, so
            # completed steps are skipped rather than double-applied. A stop
            # landing exactly at the epoch boundary is the epoch+1 case.
            ck_epoch, ck_iter = (
                (epoch + 1, 0) if done_iters >= epoch_iters else (epoch, done_iters)
            )
            if is_primary:
                logger.info(
                    "=> preemption checkpoint (epoch %d interrupted at iter "
                    "%d) to %s", ck_epoch, ck_iter, final_output_dir,
                )
                ckpt.save_train_checkpoint(
                    final_output_dir, ck_epoch, best_miou, ts, it=ck_iter
                )
            writer_dict["writer"].close()
            logger.info("exiting on SIGTERM; resume with TRAIN.RESUME true")
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)
            return

        if (
            flag_rm == 1
            or (epoch % 5 == 0 and epoch < real_end - 100)
            or (epoch >= real_end - 100)
        ):
            valid_loss, mean_iou, iou_array = engine.validate(
                cfg, testloader, eval_step, ts, mesh, writer_dict,
                num_outputs=cfg.MODEL.NUM_OUTPUTS,
                place_batch=place_eval_batch,
                should_stop=lambda: stop_requested["flag"],
            )
            if stop_requested["flag"]:
                # SIGTERM mid-validation: the epoch's training completed, so
                # checkpoint epoch+1; the partial mIoU is discarded (no
                # best-model decision from an incomplete val sweep)
                if cfg.XLA.PROFILE_DIR and epoch == last_epoch:
                    import jax

                    jax.profiler.stop_trace()
                if is_primary:
                    logger.info(
                        "=> preemption checkpoint (validation of epoch %d "
                        "interrupted) to %s", epoch, final_output_dir,
                    )
                    ckpt.save_train_checkpoint(
                        final_output_dir, epoch + 1, best_miou, ts
                    )
                writer_dict["writer"].close()
                logger.info("exiting on SIGTERM; resume with TRAIN.RESUME true")
                if prev_sigterm is not None:
                    signal.signal(signal.SIGTERM, prev_sigterm)
                return
        if flag_rm == 1:
            flag_rm = 0
        if cfg.XLA.PROFILE_DIR and epoch == last_epoch:
            import jax

            jax.profiler.stop_trace()  # profile covers the first epoch

        if is_primary:  # params are replicated; one writer is enough
            logger.info("=> saving checkpoint to %s", final_output_dir)
            ckpt.save_train_checkpoint(final_output_dir, epoch + 1, best_miou, ts)
        if mean_iou > best_miou:
            best_miou = mean_iou
            if is_primary:
                ckpt.save_model(
                    os.path.join(final_output_dir, "best.msgpack"), ts.params, ts.state
                )
        logger.info(
            "Loss: %.3f, MeanIU: %.4f, Best_mIoU: %.4f", valid_loss, mean_iou, best_miou
        )
        if iou_array is not None:
            logger.info("%s", iou_array)

    if is_primary:
        ckpt.save_model(
            os.path.join(final_output_dir, "final_state.msgpack"), ts.params, ts.state
        )
    writer_dict["writer"].close()
    if prev_sigterm is not None:
        signal.signal(signal.SIGTERM, prev_sigterm)
    logger.info("Hours: %d", int((timeit.default_timer() - start) / 3600))
    logger.info("Done")


if __name__ == "__main__":
    main()
