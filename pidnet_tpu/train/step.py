"""Data-parallel train/eval steps via shard_map over the `data` mesh axis.

Faithfulness to the reference's DataParallel semantics (SURVEY §2.7):

- each shard runs its own forward with **per-shard BatchNorm statistics**
  (like per-replica BN with batch BATCH_SIZE_PER_GPU, tools/train.py:136)
  unless `sync_bn=True`, which pmean's batch stats across shards;
- each shard runs its own **per-shard OHEM** (like each DataParallel
  replica sorting only its shard, utils/criterion.py:72);
- per-shard losses/grads are averaged with `lax.pmean` — exactly the
  `losses.mean()` + backward of the reference (utils/function.py:43-49);
- BN running-stat updates are pmean'd across shards (slight improvement
  over the reference, which keeps only replica 0's buffer updates).

The SGD update (torch semantics: wd folded into grad, momentum buffer,
optional Nesterov — torch.optim.SGD as configured at tools/train.py:139-148)
runs on replicated params outside the shard_map; XLA fuses everything
into one program per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pidnet_tpu.models import pidnet as M
from pidnet_tpu.parallel.mesh import DATA_AXIS


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: dict
    state: dict  # BN running stats
    momentum: dict  # SGD momentum buffers

    @staticmethod
    def create(params: dict, state: dict) -> "TrainState":
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return TrainState(params=params, state=state, momentum=zeros)


def _pad_to_sublanes(images, labels, edges, sample_mask=None):
    """Pad a shard batch to the next multiple of 8 rows with duplicates of
    row 0 (see make_train_step's pad_batch docstring). Returns
    (images, labels, edges, mask); mask stays None only when nothing was
    padded and none was given."""
    n_real = images.shape[0]
    if n_real % 8 == 0:
        return images, labels, edges, sample_mask
    k = 8 - n_real % 8
    rep = lambda a: jnp.concatenate([a, a[:1].repeat(k, axis=0)])  # noqa: E731
    if sample_mask is None:
        sample_mask = jnp.ones((n_real,), jnp.float32)
    mask = jnp.concatenate([sample_mask, jnp.zeros((k,), sample_mask.dtype)])
    return rep(images), rep(labels), rep(edges), mask


def _sgd(params, grads, bufs, lr, momentum, weight_decay, nesterov):
    new_params, new_bufs = {}, {}
    for k, p in params.items():
        d = grads[k] + weight_decay * p
        buf = momentum * bufs[k] + d
        step = d + momentum * buf if nesterov else buf
        new_bufs[k] = buf
        new_params[k] = p - lr * step
    return new_params, new_bufs


def make_train_step(
    spec,
    loss_fn,
    mesh,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0005,
    nesterov: bool = False,
    sync_bn: bool = False,
    compute_dtype=None,
    stem_s2d: bool = True,
    wfold: bool = True,
    wfold_region=False,
    pad_batch: bool = True,
    accum_steps: int = 1,
):
    """Build the jitted DP train step.

    step(ts: TrainState, images, labels, edges, lr) -> (ts, metrics)
    images NHWC f32 (sharded on dim 0), labels int32, edges f32.
    `stem_s2d` runs the network front in space-to-depth layout (identical
    math and checkpoints, ~MXU-friendlier; models.pidnet.stem_front_live).

    `accum_steps=A > 1` turns the step into A sequential microbatches
    over VIRTUAL data-parallel shards: inputs arrive as `(A, G, ...)`
    stacks (parallel.mesh.shard_microbatches), a `lax.scan` runs each
    `(G, ...)` microbatch through the same per-shard shard_map program
    (per-virtual-shard BN statistics and OHEM pools, exactly like A×n
    physical DataParallel replicas), gradients/metrics are averaged over
    microbatches, and BN running-stat updates — each computed from the
    step's INITIAL state — are averaged like the cross-shard pmean, so
    the update equals a physical A×n-device mesh's. One SGD update per
    step; global batch = A × n × per-shard. This reproduces the
    reference's multi-GPU global-batch recipe (e.g. 2 GPUs × batch 6,
    reference tools/train.py:82,136) on fewer chips with identical
    semantics (tests/test_accum.py pins virtual == physical).

    `pad_batch` pads each shard's batch up to the next multiple of 8 with
    masked duplicate samples. TPU tiles put the batch dim on the 8-wide
    sublane axis for most training tensors, so a per-shard batch of 6
    already PAYS for 8 everywhere while XLA adds layout copies for the odd
    shape — measured 53.3 -> ~40 ms/step for the reference's batch-6
    recipe on one v5e chip. Numerics are unchanged: padded samples are
    excluded from BatchNorm statistics (mask-weighted stats,
    nn.functional._batch_stats), carry ignore labels/zero-weight edges in
    every loss term, and contribute exactly zero gradient
    (tests/test_train_step.py::test_pad_batch_*).
    """

    if accum_steps > 1 and sync_bn:
        # BN stats cannot sync across sequential scan microbatches, so the
        # A x n-physical-mesh equivalence above would silently not hold
        raise ValueError(
            "accum_steps > 1 does not compose with sync_bn: microbatches "
            "run sequentially and their BN statistics cannot be pmean'd "
            "together; use per-shard BN or more physical devices"
        )

    n_shards = mesh.shape[DATA_AXIS]

    def shard_loss(params, state, images, labels, edges):
        sample_weight = None
        if pad_batch:
            images, labels, edges, sample_weight = _pad_to_sublanes(
                images, labels, edges
            )

        def loss_of(p):
            outputs, new_state = M.apply(
                p,
                state,
                images,
                spec,
                train=True,
                sync_bn_axis=DATA_AXIS if sync_bn else None,
                compute_dtype=compute_dtype,
                stem_s2d=stem_s2d,
                wfold=wfold,
                wfold_region=wfold_region,
                sample_weight=sample_weight,
            )
            loss, metrics = loss_fn(
                outputs, labels, edges, sample_mask=sample_weight
            )
            # Differentiating w.r.t. a REPLICATED input inside shard_map
            # implicitly psums the cotangent across shards; scaling the
            # per-shard loss by 1/n makes that psum the DataParallel
            # `losses.mean()` gradient (utils/function.py:43-45).
            return loss / n_shards, (new_state, metrics)

        (_, (new_state, metrics)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(params)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        new_state = jax.lax.pmean(new_state, DATA_AXIS)
        return grads, new_state, metrics

    sharded = jax.shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P()),
    )

    @partial(jax.jit, donate_argnums=(0,))
    def step(ts: TrainState, images, labels, edges, lr):
        if accum_steps == 1:
            grads, new_state, metrics = sharded(
                ts.params, ts.state, images, labels, edges
            )
        else:

            def body(g_acc, micro):
                g, st, mt = sharded(ts.params, ts.state, *micro)
                return jax.tree.map(jnp.add, g_acc, g), (st, mt)

            g_sum, (states, mets) = jax.lax.scan(
                body,
                jax.tree.map(jnp.zeros_like, ts.params),
                (images, labels, edges),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, g_sum)
            new_state = jax.tree.map(lambda s: jnp.mean(s, axis=0), states)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), mets)
        new_params, new_bufs = _sgd(
            ts.params, grads, ts.momentum, lr, momentum, weight_decay, nesterov
        )
        return TrainState(new_params, new_state, new_bufs), metrics

    return step


def make_eval_step(
    spec,
    loss_fn,
    mesh,
    *,
    num_classes: int,
    compute_dtype=None,
    stem_s2d: bool = True,
    wfold: bool = True,
    pad_batch: bool = True,
):
    """Validation step: per-shard forward (eval-mode BN) + loss + on-device
    confusion matrices, psum'd across shards.

    step(ts, images, labels, edges, sample_mask) -> (metrics, cms).
    `sample_mask` (N,) f32 in {0,1} marks real vs padding samples in the
    final partial batch (engine.validate pads it up to the global batch so
    it still shards): padded samples are inert in the loss (FullLoss masks
    them) and cross-shard metrics are averaged weighted by each shard's
    real-sample count, so the reported scalars equal an unpadded run's.
    cms has shape (num_seg_outputs, C, C) — the device-side equivalent of
    reference utils/function.py:77-128, which accumulated CPU numpy
    confusion matrices per output.
    """
    from pidnet_tpu.metrics import confusion_matrix
    from pidnet_tpu.ops.resize import resize_bilinear
    from pidnet_tpu.ops.upsample_argmax import upsample_argmax

    def shard_eval(params, state, images, labels, edges, sample_mask):
        # same sublane alignment as the train step (pad_batch docstring);
        # eval-mode BN uses running stats, so only the mask machinery is
        # needed — padded rows get mask 0 like engine.validate's partial-
        # batch padding
        if pad_batch:
            images, labels, edges, sample_mask = _pad_to_sublanes(
                images, labels, edges, sample_mask
            )
        outputs = M.apply(
            params, state, images, spec, train=False, compute_dtype=compute_dtype,
            stem_s2d=stem_s2d, wfold=wfold,
        )
        loss, metrics = loss_fn(outputs, labels, edges, sample_mask=sample_mask)
        shard_w = jnp.sum(sample_mask.astype(jnp.float32))
        total_w = jax.lax.psum(shard_w, DATA_AXIS)
        metrics = {
            k: jax.lax.psum(v * shard_w, DATA_AXIS) / jnp.maximum(total_w, 1.0)
            for k, v in metrics.items()
        }
        # global real-sample count — engine.validate weights its epoch
        # meter by THIS (not the local mask sum) so every process reports
        # the exact same global average even when tail batches leave ranks
        # with different real-sample counts
        metrics["weight"] = total_w
        # padding defense for the CMs: masked samples are all-ignore
        labels = jnp.where(
            sample_mask.reshape(-1, 1, 1) > 0, labels, loss_fn.ignore_label
        )
        h, w = labels.shape[1], labels.shape[2]
        cms = []
        for o in outputs[:-1]:
            if compute_dtype == jnp.bfloat16:
                # bf16 eval: the fused upsample+argmax kernel keeps the
                # full-resolution C-channel logits out of HBM entirely
                # (ops/upsample_argmax.py) — the bf16 interpolation's rare
                # argmax tie flips are within the path's accuracy budget
                # (same treatment as the train-path acc, criterion.py)
                seg = upsample_argmax(o, (h, w), loss_fn.align_corners)
            else:
                # fp32 parity path: exact XLA resize, bit-faithful mIoU vs
                # the reference's upsample-then-argmax (utils/function.py)
                seg = resize_bilinear(o, (h, w), loss_fn.align_corners)
            cm = confusion_matrix(seg, labels, num_classes, loss_fn.ignore_label)
            cms.append(jax.lax.psum(cm.astype(jnp.float32), DATA_AXIS))
        return metrics, jnp.stack(cms)

    sharded = jax.shard_map(
        shard_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(ts: TrainState, images, labels, edges, sample_mask):
        return sharded(ts.params, ts.state, images, labels, edges, sample_mask)

    return step
