"""Epoch-level train/validate/test loops.

The TPU-side analogues of reference utils/function.py: the host loop feeds
prefetched fixed-shape batches to the jitted shard_map steps and keeps
running meters; validation accumulates on-device confusion matrices per
seg output; `testval`/`test` run single-image inference with logits
upsampled to input size (and `.exp()`, reference base_dataset.py:136-150).
"""

from __future__ import annotations

import logging
import math
import time
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from pidnet_tpu.metrics import acc_from_cm, iou_from_cm
from pidnet_tpu.ops.resize import resize_bilinear
from pidnet_tpu.parallel import shard_batch
from pidnet_tpu.utils import AverageMeter

log = logging.getLogger("pidnet_tpu")


def train_one_epoch(
    cfg,
    epoch: int,
    epoch_iters: int,
    num_iters: int,
    base_lr: float,
    loader,
    step_fn,
    ts,
    mesh,
    writer_dict,
    place_batch=None,
    should_stop=None,
    start_iter: int = 0,
):
    """One training epoch (reference utils/function.py:21-75).
    Returns (ts, completed_iters).

    `place_batch(images, labels, edges)` puts a host batch onto devices;
    default = `shard_batch(mesh, ...)` (1-D data mesh). The spatial
    training path passes `parallel.spatial.put_batch` over its 2-D mesh.

    `should_stop()` (optional) is polled at each step boundary; when it
    returns True the epoch stops early with meters flushed — the hook for
    graceful preemption (tools/train.py installs a SIGTERM handler that
    sets it, then checkpoints and exits cleanly).

    `start_iter` resumes mid-epoch: the loader is pinned to this epoch's
    deterministic sample order (Loader.set_epoch) and the first
    `start_iter` batches are skipped without decoding, so the remaining
    steps run with exactly the samples, augmentations, and poly-LR
    positions the interrupted run would have used (iteration-exact
    preemption resume; the completed-iteration count travels in the
    checkpoint, train/checkpoint.py).
    """
    from pidnet_tpu.train import poly_lr

    if place_batch is None:
        place_batch = lambda *arrays: shard_batch(mesh, *arrays)  # noqa: E731

    batch_time = AverageMeter()
    ave_loss = AverageMeter()
    ave_acc = AverageMeter()
    avg_sem_loss = AverageMeter()
    avg_bce_loss = AverageMeter()
    tic = time.time()
    cur_iters = epoch * epoch_iters

    def fold(it, metrics):
        """Pull a step's device scalars (sync point) into the meters.

        Divergence guard (beyond-reference: utils/function.py:43-49 would
        train on NaN forever): a non-finite loss aborts the run at the
        meters' existing sync point — no extra device round-trips — so the
        per-epoch checkpoint (tools/train.py) still holds the last finite
        state to resume from after lowering TRAIN.LR.
        """
        m = {k: float(v) for k, v in metrics.items()}
        if not math.isfinite(m["loss"]):
            raise FloatingPointError(
                f"non-finite training loss {m['loss']} at epoch {epoch} "
                f"iter {it} (global iter {it + cur_iters}) — diverged; "
                "resume from the last checkpoint with a lower TRAIN.LR"
            )
        ave_loss.update(m["loss"])
        ave_acc.update(m["acc"])
        avg_sem_loss.update(m["sem_loss"])
        avg_bce_loss.update(m["bce_loss"])

    # One step's metrics are kept in flight un-synced so the host-side
    # data pipeline overlaps device compute; on PRINT_FREQ iterations the
    # in-flight step is folded immediately (one pipeline bubble per
    # PRINT_FREQ steps), so every log line shows meters over steps 0..i —
    # the reference's exact meter semantics (utils/function.py:26-72).
    pending = None
    done = start_iter  # steps completed so far this epoch
    if hasattr(loader, "set_epoch"):
        # pin the deterministic per-(seed, epoch) sample order; +1 keeps
        # the stream identical to the pre-set_epoch counter convention
        # (a fresh run's first epoch 0 iterates the loader's epoch 1)
        loader.set_epoch(epoch + 1)
    if start_iter:
        if not hasattr(loader, "skip_batches"):
            raise ValueError(
                f"start_iter={start_iter} needs a loader with skip_batches()"
            )
        loader.skip_batches(start_iter)
    for i_iter, (images, labels, edges, _, _) in enumerate(loader, start=start_iter):
        if should_stop is not None and should_stop():
            log.info(
                "stop requested — ending epoch %d early at iter %d", epoch, i_iter
            )
            break
        # Exact reference schedule: adjust_learning_rate runs AFTER
        # optimizer.step() (utils/function.py:49,61-64), so the update at
        # global iter g is applied with poly(g-1) — poly(0)=base_lr covers
        # the very first step — while the log line prints poly(g).
        g = i_iter + cur_iters
        lr = poly_lr(base_lr, num_iters, max(0, g - 1))
        batch = place_batch(images, np.asarray(labels, np.int32), edges)
        ts, metrics = step_fn(ts, *batch, lr)
        done = i_iter + 1
        lr = poly_lr(base_lr, num_iters, g)  # what the reference logs

        if pending is not None:
            fold(*pending)
        pending = (i_iter, metrics)
        batch_time.update(time.time() - tic)
        tic = time.time()

        if i_iter % cfg.PRINT_FREQ == 0:
            fold(*pending)
            pending = None
            log.info(
                "Epoch: [%d/%d] Iter:[%d/%d], Time: %.2f, lr: [%s], "
                "Loss: %.6f, Acc:%.6f, Semantic loss: %.6f, BCE loss: %.6f, "
                "SB loss: %.6f",
                epoch,
                cfg.TRAIN.END_EPOCH,
                i_iter,
                epoch_iters,
                batch_time.average(),
                f"{lr:.6g}",
                ave_loss.average(),
                ave_acc.average(),
                avg_sem_loss.average(),
                avg_bce_loss.average(),
                ave_loss.average() - avg_sem_loss.average() - avg_bce_loss.average(),
            )

    if pending is not None:  # flush the final in-flight step's metrics
        fold(*pending)

    if ave_loss.count:  # a zero-step epoch (e.g. stop at iter 0) has no loss
        writer = writer_dict["writer"]
        writer.add_scalar(
            "train_loss", ave_loss.average(), writer_dict["train_global_steps"]
        )
        writer_dict["train_global_steps"] += 1
    return ts, done


def validate(cfg, loader, eval_step, ts, mesh, writer_dict, num_outputs: int = 2,
             place_batch=None, should_stop=None):
    """Loss + per-output confusion matrices (reference utils/function.py:77-128).
    Returns (ave_loss, mean_IoU of the last output, its IoU array).
    `place_batch` overrides the default 1-D-mesh batch placement (the
    --spatial path passes parallel.spatial.put_batch so each sample's H
    spans the spatial axis and eval_step is the spatial GSPMD step).

    `should_stop()` (optional) is polled per batch — a preemption SIGTERM
    landing mid-validation (minutes over the full val set) must not burn
    the whole grace window; the partial results are returned and the
    caller checks the flag before using them (tools/train.py skips the
    best-model decision and checkpoints immediately).
    """
    ave_loss = AverageMeter()
    num_classes = cfg.DATASET.NUM_CLASSES
    cms = np.zeros((num_outputs, num_classes, num_classes), np.float64)
    batch_size = loader.batch_size
    # multi-process loaders wrap-pad each rank's epoch to equal batch
    # counts (DistributedSampler semantics); the duplicates sit at the
    # TAIL of the rank's order — mask them so their pixels don't enter
    # the confusion matrices twice and mIoU matches a 1-process run
    n_real_epoch = getattr(loader, "samples_per_epoch", None)
    stopped = False
    n_seen = 0

    for idx, (images, labels, edges, _, _) in enumerate(loader):
        if should_stop is not None and should_stop():
            log.info("stop requested — ending validation early at batch %d", idx)
            stopped = True
            break
        n_real = images.shape[0]
        if n_real < batch_size:
            # pad the final partial batch so it still shards over the mesh;
            # the sample mask makes padded samples inert in the loss and
            # the confusion matrices (FullLoss/make_eval_step docstrings)
            pad = batch_size - n_real
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
            labels = np.concatenate(
                [labels, np.full((pad, *labels.shape[1:]), cfg.TRAIN.IGNORE_LABEL, labels.dtype)]
            )
            edges = np.concatenate([edges, np.zeros((pad, *edges.shape[1:]), edges.dtype)])
        mask = (np.arange(batch_size) < n_real).astype(np.float32)
        if n_real_epoch is not None:
            mask *= (n_seen + np.arange(batch_size) < n_real_epoch).astype(np.float32)
        n_seen += n_real
        place = place_batch if place_batch is not None else partial(shard_batch, mesh)
        batch = place(images, np.asarray(labels, np.int32), edges, mask)
        metrics, batch_cms = eval_step(ts, *batch)
        cms += np.asarray(batch_cms, np.float64)
        # weight by the GLOBAL real-sample count (returned by the eval
        # step) so padded/duplicate samples don't skew the epoch average
        # and multi-process ranks — whose local tail counts can differ —
        # all report the exact same global loss
        ave_loss.update(
            float(metrics["loss"]), float(metrics.get("weight", mask.sum()))
        )
        if idx % 10 == 0:
            log.info("validating: %d", idx)

    for i in range(num_outputs):
        iou, miou = iou_from_cm(cms[i])
        log.info("%d %s %s", i, iou, miou)
    iou_array, mean_iou = iou_from_cm(cms[-1])

    if not stopped:
        writer = writer_dict["writer"]
        writer.add_scalar("valid_loss", ave_loss.average(), writer_dict["valid_global_steps"])
        writer.add_scalar("valid_mIoU", mean_iou, writer_dict["valid_global_steps"])
        writer_dict["valid_global_steps"] += 1
    return ave_loss.average(), mean_iou, iou_array


def _select_output(cfg, out):
    """Pick TEST.OUTPUT_INDEX from a multi-output model result (reference
    base_dataset.py:140-141). NUM_OUTPUTS==1 with a multi-output
    (augment=True) model is a misconfiguration; error rather than silently
    argmax-ing the 1-channel boundary head."""
    if isinstance(out, (list, tuple)):
        if cfg.MODEL.NUM_OUTPUTS > 1:
            return out[cfg.TEST.OUTPUT_INDEX]
        raise ValueError(
            "model returned multiple outputs but MODEL.NUM_OUTPUTS==1; "
            "set MODEL.NUM_OUTPUTS and TEST.OUTPUT_INDEX consistently"
        )
    return out


def _spatial_jit_opts(spatial_mesh):
    """(shard_hint, jit kwargs) for an optional (data, spatial) mesh: the
    input image is sharded N×H across it, params/state ride as REPLICATED
    jit arguments (embedding them as closure constants under a sharded jit
    lets the partitioner re-layout them inconsistently — observed to
    corrupt logits on the CPU mesh), and the model runs under the GSPMD
    partitioner (parallel/spatial.py) — conv halo exchange and pooling
    reductions all emitted by XLA. None → plain single-device jit."""
    if spatial_mesh is None:
        return None, {}
    from pidnet_tpu.parallel.spatial import image_sharding, replicated, spp_hint

    rep = replicated(spatial_mesh)
    return spp_hint(spatial_mesh), {
        "in_shardings": (rep, rep, image_sharding(spatial_mesh))
    }


def _data_parallel_infer(fn, data_mesh):
    """Map a single-device inference body over the batch dim of a 1-D data
    mesh with shard_map: each device runs the IDENTICAL local program
    (Pallas kernels included — unlike GSPMD, which cannot partition an
    opaque custom call), params/state replicated, batch dim-0 sharded.
    The eval model has no cross-sample ops (BN uses running stats), so the
    per-device programs are independent."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from pidnet_tpu.parallel.mesh import DATA_AXIS

    return jax.jit(
        shard_map(
            fn,
            mesh=data_mesh,
            in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_rep=False,
        )
    )


def _finalize_infer(_body, params, state, *, spatial_mesh, data_mesh, jit_opts, bake):
    """Close an inference body over its weights in one of three ways:
    data-mesh shard_map, plain jit with weights as arguments, or — with
    `bake=True` — weights as jit CONSTANTS, so XLA constant-folds every
    per-call weight preparation (f32->bf16 casts, the s2d/wfold one-hot
    einsum kernel expansions, layout copies) at compile time: the serving
    path. Baking is incompatible with a spatial mesh (the partitioner
    re-lays out closure constants inconsistently, see _spatial_jit_opts)."""
    if data_mesh is not None and spatial_mesh is None:
        _infer = _data_parallel_infer(_body, data_mesh)
    elif bake and spatial_mesh is None:
        baked = jax.jit(lambda x: _body(params, state, x))
        return baked
    else:
        from functools import partial

        _infer = partial(jax.jit, **jit_opts)(_body)

    def infer(x):
        return _infer(params, state, x)

    return infer


def make_inference(
    cfg, spec, params, state, *, folded=False, compute_dtype=None, spatial_mesh=None,
    data_mesh=None, bake=False,
):
    """Single-image inference closure (reference base_dataset.py:136-150):
    model -> pick TEST.OUTPUT_INDEX -> bilinear to input size
    (align_corners=cfg.MODEL.ALIGN_CORNERS) -> exp().

    `data_mesh`: a 1-D data mesh — the batch dim is sharded across its
    devices (offline eval parallelism; the input batch must be a multiple
    of the mesh size — engine.testval/test pad the tail). `bake`: embed
    the weights as jit constants so per-call weight preparation constant-
    folds away (serving; see _finalize_infer)."""
    from pidnet_tpu.models import pidnet as M

    hint, jit_opts = _spatial_jit_opts(spatial_mesh)

    def _body(params, state, x):
        out = M.apply(
            params, state, x, spec, folded=folded, compute_dtype=compute_dtype,
            stem_s2d=folded, wfold=folded, wfold_region="auto", shard_hint=hint,
        )
        out = _select_output(cfg, out)
        pred = resize_bilinear(out, (x.shape[1], x.shape[2]), cfg.MODEL.ALIGN_CORNERS)
        return jnp.exp(pred.astype(jnp.float32))

    return _finalize_infer(
        _body, params, state, spatial_mesh=spatial_mesh, data_mesh=data_mesh,
        jit_opts=jit_opts, bake=bake,
    )


def make_inference_classmap(
    cfg, spec, params, state, *, folded=False, compute_dtype=None, spatial_mesh=None,
    data_mesh=None, bake=False,
):
    """Class-map inference closure: model -> OUTPUT_INDEX -> fused
    bilinear-upsample+argmax (ops/upsample_argmax.py, Pallas on TPU) ->
    (N,H,W) int32. Argmax-equivalent to `make_inference` (exp() is
    monotonic, reference base_dataset.py:150) while never materializing
    or transferring full-resolution 19-channel logits — the speed path
    for testval/test/custom. Under a spatial mesh the Pallas kernel is
    disabled via ops.pallas_gate (an opaque custom call the SPMD
    partitioner could not shard) and the XLA resize+argmax pair runs.
    Under a `data_mesh` the batch dim is sharded via shard_map — the
    per-device program (Pallas kernel included) is unchanged. `bake`:
    weights as jit constants (serving; see _finalize_infer)."""
    import contextlib

    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.ops.pallas_gate import no_pallas
    from pidnet_tpu.ops.upsample_argmax import upsample_argmax

    hint, jit_opts = _spatial_jit_opts(spatial_mesh)
    gate = no_pallas if spatial_mesh is not None else contextlib.nullcontext

    def _body(params, state, x):
        with gate():
            out = M.apply(
                params, state, x, spec, folded=folded, compute_dtype=compute_dtype,
                stem_s2d=folded, wfold=folded, wfold_region="auto", shard_hint=hint,
            )
            out = _select_output(cfg, out)
            return upsample_argmax(
                out, (x.shape[1], x.shape[2]), cfg.MODEL.ALIGN_CORNERS
            )

    return _finalize_infer(
        _body, params, state, spatial_mesh=spatial_mesh, data_mesh=data_mesh,
        jit_opts=jit_opts, bake=bake,
    )


@partial(jax.jit, donate_argnums=(0,))
def _acc_window(acc, win, r0, q0):
    """acc[:, r0:r0+wh, q0:q0+ww] += win, in place (acc is donated).

    Offsets are traced scalars so every window of a given canvas/window
    shape reuses one compiled program; the donated buffer makes the
    dynamic-update-slice an in-place write instead of a canvas copy."""
    idx = (0, r0, q0, 0)
    cur = jax.lax.dynamic_slice(acc, idx, win.shape)
    return jax.lax.dynamic_update_slice(acc, cur + win, idx)


@lru_cache(maxsize=8)
def _overlap_count(rows, cols, stride_h, stride_w, crop_h, crop_w, ph, pw):
    """(1, ph, pw, 1) f32 window-overlap counts — static per shape.

    Returns NUMPY (trace-inert): a jnp constant created inside one jit
    trace would leak through the lru_cache into the next trace
    (UnexpectedTracerError when _scale_probs runs under jit)."""
    cnt = np.zeros((1, ph, pw, 1), np.float32)
    for r in range(rows):
        for q in range(cols):
            r0, q0 = r * stride_h, q * stride_w
            cnt[:, r0 : r0 + crop_h, q0 : q0 + crop_w] += 1.0
    return cnt


def make_ms_flip_inference(cfg, spec, params, state, *, folded=False, compute_dtype=None):
    """Multi-scale + flip test-time-augmentation inference closure.

    Implements the `TEST.MULTI_SCALE` / `TEST.FLIP_TEST` config keys the
    reference declares but never consumes (reference configs/default.py:84-85
    — HRNet-lineage flags whose implementation was dropped; the reference is
    single-scale only, SURVEY §2.6). Semantics follow the
    HRNet-Semantic-Segmentation protocol the reference derives from
    (reference README.md:74):

      per scale s in TEST.SCALE_LIST: resize the image so its long side is
      int(TEST.BASE_SIZE * s + 0.5) (aspect preserved); run the model on the
      whole image if it fits TEST.IMAGE_SIZE, else on a grid of
      TEST.IMAGE_SIZE windows with 2/3-overlap stride, count-averaging the
      overlaps; flip-averaging (mean of the window's logits and the
      un-flipped logits of the W-flipped window) happens per window before
      exp(); per-scale exp'd probability maps are resized to the input size
      and SUMMED over scales.

    TPU-first structure: every window of a scale AND its flip variant are
    stacked into crop-size model batches (chunked from a fixed size set
    {8,4,2,1}, so at most four programs ever compile and no padding waste);
    flip-averaging happens on the model's native 1/8-resolution logits and
    ONE batched bilinear upsample produces all crop-resolution maps —
    offsets/shapes are static Python ints; per-scale resizes re-trace per
    shape (tiny programs). Returns (N,H,W,C) f32 summed probabilities, the
    same contract as `make_inference` — testval/test/save_pred consume it
    unchanged."""
    from pidnet_tpu.models import pidnet as M

    crop_h, crop_w = int(cfg.TEST.IMAGE_SIZE[1]), int(cfg.TEST.IMAGE_SIZE[0])
    flip = bool(cfg.TEST.FLIP_TEST)
    scales = (
        [float(s) for s in cfg.TEST.SCALE_LIST] if cfg.TEST.MULTI_SCALE else [1.0]
    )
    align = cfg.MODEL.ALIGN_CORNERS
    base = int(cfg.TEST.BASE_SIZE)
    # HRNet window overlap: stride = int(crop * 2/3) — numpy int()
    # truncation, matching HRNet multi_scale_inference's
    # `np.int(self.crop_size[i] / 3.0 * 2.0)` (floor, not round)
    stride_h, stride_w = max(1, int(crop_h * 2 / 3)), max(1, int(crop_w * 2 / 3))

    @jax.jit
    def _batch_logits(params, state, xw):
        """(B, crop_h, crop_w, 3) -> LOW-RES f32 logits (B, h/8, w/8, C).

        The model's native 1/8-resolution output: flip-averaging and the
        (single, batched) upsample to crop resolution happen OUTSIDE, on
        the small maps — bilinear resize is linear and W-symmetric, so
        averaging before resizing is exact and halves the full-res work."""
        out = M.apply(
            params, state, xw, spec, folded=folded, compute_dtype=compute_dtype,
            stem_s2d=folded, wfold=folded, wfold_region="auto",
        )
        return _select_output(cfg, out).astype(jnp.float32)

    def _chunk_plan(k: int, n: int) -> list[int]:
        """Greedy decomposition of k windows into call sizes from a fixed
        set, capping each model batch (windows x images) at 8 — so at most
        four batch sizes ever compile, with zero padding waste."""
        sizes = [c for c in (8, 4, 2, 1) if c == 1 or c * n <= 8]
        plan = []
        while k:
            c = next(s for s in sizes if s <= k)
            plan.append(c)
            k -= c
        return plan

    def _windows_probs(xp, offsets):
        """Exp'd crop-resolution probabilities for every window of one
        padded canvas: ONE stacked tensor of (window, flip) variants runs
        through chunked `_batch_logits` calls — windows of a scale (and
        their flips) share model batches instead of running serially."""
        n = xp.shape[0]
        wins = jnp.stack(
            [xp[:, r0 : r0 + crop_h, q0 : q0 + crop_w] for r0, q0 in offsets]
        )  # (K, N, crop_h, crop_w, 3)
        if flip:
            # interleave [w0, flip(w0), w1, flip(w1), ...] so each window's
            # flip pair lands in the same (even-sized) model chunk
            wins = jnp.stack([wins, wins[:, :, :, ::-1]], 1).reshape(
                (-1,) + wins.shape[1:]
            )
        k2 = wins.shape[0]
        flat = wins.reshape((-1,) + wins.shape[2:])
        zs, i = [], 0
        for c in _chunk_plan(k2, n):
            zs.append(_batch_logits(params, state, flat[i * n : (i + c) * n]))
            i += c
        z = jnp.concatenate(zs, 0) if len(zs) > 1 else zs[0]
        z = z.reshape((k2, n) + z.shape[1:])
        if flip:
            z = 0.5 * (z[0::2] + z[1::2][:, :, :, ::-1])
        k = z.shape[0]
        zf = z.reshape((k * n,) + z.shape[2:])
        pr = jnp.exp(resize_bilinear(zf, (crop_h, crop_w), align))
        return pr.reshape((k, n, crop_h, crop_w, pr.shape[-1]))

    def _scale_probs(x, nh: int, nw: int):
        """Exp'd probabilities for one scale, at (nh, nw) resolution."""
        xs = x if (nh, nw) == (x.shape[1], x.shape[2]) else resize_bilinear(
            x, (nh, nw), False  # image resampling: half-pixel (cv2) convention
        )
        if nh <= crop_h and nw <= crop_w:
            xp = jnp.pad(xs, ((0, 0), (0, crop_h - nh), (0, crop_w - nw), (0, 0)))
            return _windows_probs(xp, [(0, 0)])[0][:, :nh, :nw]
        rows = 1 + max(0, -(-(nh - crop_h) // stride_h))
        cols = 1 + max(0, -(-(nw - crop_w) // stride_w))
        ph = stride_h * (rows - 1) + crop_h
        pw = stride_w * (cols - 1) + crop_w
        xp = jnp.pad(xs, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)))
        n, c = x.shape[0], spec.num_classes
        offsets = [
            (r * stride_h, q * stride_w) for r in range(rows) for q in range(cols)
        ]
        probs = _windows_probs(xp, offsets)
        # Window accumulation runs through ONE donated jitted update (an
        # in-place dynamic-update-slice with traced offsets) instead of
        # eager .at[].add — the eager form copied the whole (N,ph,pw,C)
        # canvas once per window. The overlap count is a deterministic
        # function of static shapes: precomputed host-side, cached.
        acc = jnp.zeros((n, ph, pw, c), jnp.float32)
        for k, (r0, q0) in enumerate(offsets):
            acc = _acc_window(acc, probs[k], r0, q0)
        cnt = _overlap_count(rows, cols, stride_h, stride_w, crop_h, crop_w, ph, pw)
        return (acc / cnt)[:, :nh, :nw]

    multi_scale = bool(cfg.TEST.MULTI_SCALE)

    # One jitted program per (scale-resolution, output-resolution): the
    # whole per-scale pipeline — image resample, window batching, model
    # runs, flip/overlap accounting, exp, upsample back — dispatches as a
    # SINGLE device call. The eager composition was host-dispatch-bound:
    # a 6-scale+flip Frankfurt pass measured 448 ms device-busy inside
    # ~2.5 s wall (~180 small dispatches through the axon tunnel);
    # fusing per scale recovers the device-bound rate. Shapes are static
    # Python ints, so each (nh, nw, oh, ow) compiles once and is cached.
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def _scale_fn(nh: int, nw: int, oh: int, ow: int):
        def run(x):
            p = _scale_probs(x, nh, nw)
            if (nh, nw) != (oh, ow):
                p = resize_bilinear(p, (oh, ow), False)
            return p

        return jax.jit(run)

    def infer(x):
        x = jnp.asarray(x)
        n, ori_h, ori_w = x.shape[0], x.shape[1], x.shape[2]
        final = None
        for s in scales:
            if not multi_scale:
                # flip-only TTA: native resolution, no resample — the
                # reference's flip protocol never rescales
                # (reference datasets/base_dataset.py inference()).
                nh, nw = ori_h, ori_w
            elif ori_h > ori_w:
                long_size = int(base * s + 0.5)
                nh, nw = long_size, max(1, int(ori_w * long_size / ori_h + 0.5))
            else:
                long_size = int(base * s + 0.5)
                nw, nh = long_size, max(1, int(ori_h * long_size / ori_w + 0.5))
            p = _scale_fn(nh, nw, ori_h, ori_w)(x)
            final = p if final is None else final + p
        return final

    return infer


def _pad_rows(images, batch_pad: int):
    """Pad a batch's dim 0 to a multiple of `batch_pad` by repeating the
    last sample (mesh-parallel eval needs every batch divisible by the
    device count; the caller slices predictions back to the real count)."""
    n_real = images.shape[0]
    pad = -n_real % batch_pad
    if pad:
        images = np.concatenate([images, np.repeat(images[-1:], pad, axis=0)])
    return images, n_real


def testval(
    cfg, dataset, loader, infer, sv_dir: str = "./", sv_pred: bool = False,
    batch_pad: int = 1,
):
    """Labeled single-scale evaluation (reference utils/function.py:131-177).

    `batch_pad`: pad every batch's dim 0 to this multiple (repeating the
    last sample) before `infer`, then drop the padded predictions — the
    contract of the data-mesh inference closures, whose batch must divide
    the device count. Metrics are exact: padded rows never reach the
    confusion matrix."""
    import os

    from pidnet_tpu.metrics import confusion_matrix

    num_classes = cfg.DATASET.NUM_CLASSES
    cm = np.zeros((num_classes, num_classes), np.float64)
    for index, (images, labels, _, _, names) in enumerate(loader):
        images, n_real = _pad_rows(np.asarray(images), batch_pad)
        pred = infer(jnp.asarray(images))
        if pred.shape[0] != n_real:
            pred = pred[:n_real]
        cm += np.asarray(
            confusion_matrix(
                pred, jnp.asarray(labels, jnp.int32), num_classes,
                cfg.TRAIN.IGNORE_LABEL,
            ),
            np.float64,
        )
        if sv_pred:
            sv_path = os.path.join(sv_dir, "val_results")
            os.makedirs(sv_path, exist_ok=True)
            dataset.save_pred(np.asarray(pred), sv_path, names)
        if index % 100 == 0:
            log.info("processing: %d images", index)
            _, miou = iou_from_cm(cm)
            log.info("mIoU: %.4f", miou)

    iou_array, mean_iou = iou_from_cm(cm)
    pixel_acc, mean_acc = acc_from_cm(cm)
    return mean_iou, iou_array, pixel_acc, mean_acc


def test(
    cfg, dataset, loader, infer, sv_dir: str = "./", sv_pred: bool = True,
    batch_pad: int = 1,
):
    """Unlabeled test-server inference (reference utils/function.py:180-202)."""
    import os

    for images, sizes, names in loader:
        images, n_real = _pad_rows(np.asarray(images), batch_pad)
        pred = infer(jnp.asarray(images))
        if sv_pred:
            sv_path = os.path.join(sv_dir, "test_results")
            os.makedirs(sv_path, exist_ok=True)
            dataset.save_pred(np.asarray(pred)[:n_real], sv_path, names)
