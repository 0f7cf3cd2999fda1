"""Spatial partitioning: shard the image H dim across a mesh axis (GSPMD).

SURVEY §2.7 reserves an optional "spatial partitioning of H/W dims with
halo exchange for convs" as the CNN analogue of sequence/context
parallelism — for when a single full-resolution activation set exceeds
per-chip HBM (the reference's closest analogue is one-device 2048x1024
eval, configs/*/yaml TEST.IMAGE_SIZE).

TPU-native design: instead of hand-writing `ppermute` halo exchanges in a
shard_map (the obvious translation), we jit the UNMODIFIED network with
`jax.sharding` annotations that split N over a `data` axis and H over a
`spatial` axis, and let XLA's SPMD partitioner insert the conv halo
exchanges, the cross-shard reductions behind BatchNorm batch statistics
and DAPPM/PAPPM global pooling, and the collectives behind the global
OHEM threshold — all riding ICI. This keeps one source of truth for the
model math (models/pidnet.py) with zero partitioning-aware code in it,
and the partitioner's halo exchange is exactly the overlap-region
`ppermute` we would otherwise write by hand.

Semantics note: the spatial train step is a *global-batch* program —
BatchNorm uses global (sync-BN) statistics and OHEM thresholds over the
global pixel pool, because spatial shards of one image must share both.
That matches `make_train_step(..., sync_bn=True)` up to OHEM granularity
(global top-k rather than per-replica top-k); the per-shard-BN torch
DataParallel semantics live in train/step.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pidnet_tpu.ops.pallas_gate import no_pallas
from pidnet_tpu.parallel.mesh import DATA_AXIS

SPATIAL_AXIS = "spatial"


def make_mesh_2d(n_data: int, n_spatial: int, devices=None) -> Mesh:
    """(data, spatial) mesh over the first n_data*n_spatial devices.

    The spatial axis is placed minor (fastest-varying over the device
    order) so H-dim halo exchanges ride adjacent-chip ICI links.
    """
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if need > len(devices):
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch: N over `data`, H over `spatial`."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spp_hint(mesh: Mesh):
    """Model partitioning hook (models.pidnet._hint): un-shard the H dim
    for the 1/64 PPM stage. The maps there are tiny (16x32 at 1024x2048
    input), so replicating H costs one small all-gather and removes both
    the per-pool halo collectives and GSPMD's giant-padding reduce_window
    edge cases (observed to produce wrong gradients on a 2-D mesh);
    "post_spp" re-shards the 1/8-res output back onto the spatial axis."""
    batch_only = NamedSharding(mesh, P(DATA_AXIS))
    sharded = NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))

    def hint(name, x):
        if name == "pre_spp":
            return jax.lax.with_sharding_constraint(x, batch_only)
        if name == "post_spp":
            return jax.lax.with_sharding_constraint(x, sharded)
        return x

    return hint


def make_spatial_infer(
    spec,
    mesh: Mesh,
    *,
    folded: bool = False,
    compute_dtype=None,
    stem_s2d: bool = False,
    wfold: bool = False,
    use_spp_hint: bool = True,
):
    """Jitted inference forward with N×H sharded input, replicated params.

    Returns fn(params_or_folded, state, x) -> outputs (each head sharded
    like the input; gather with jax.device_get as needed). With
    `folded=True` pass the fold_params output and `state={}`.
    `use_spp_hint=False` leaves the 1/64 PPM stage H-sharded instead of
    applying the spp_hint un-shard/re-shard (test hook: the hint must be
    a pure layout choice, never a numerics change).
    """
    from pidnet_tpu.models import pidnet as M

    img_s = image_sharding(mesh)
    rep = replicated(mesh)
    hint = spp_hint(mesh) if use_spp_hint else None

    @partial(jax.jit, in_shardings=(rep, rep, img_s))
    def fn(params, state, x):
        with no_pallas():  # opaque custom calls can't be SPMD-partitioned
            outs = M.apply(
                params,
                state,
                x,
                spec,
                train=False,
                folded=folded,
                compute_dtype=compute_dtype,
                stem_s2d=stem_s2d,
                wfold=wfold,
                shard_hint=hint,
            )
        # Keep heads in the input layout; downstream (resize/argmax) stays
        # spatially sharded too. augment=False specs return ONE head array,
        # not a list — constrain it directly (iterating it would walk the
        # batch dim and pin H/W to the wrong mesh axes).
        constrain = lambda o: jax.lax.with_sharding_constraint(o, img_s)
        if isinstance(outs, (list, tuple)):
            return [constrain(o) for o in outs]
        return constrain(outs)

    return fn


def make_spatial_train_step(
    spec,
    loss_fn,
    mesh: Mesh,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0005,
    nesterov: bool = False,
    compute_dtype=None,
    stem_s2d: bool = False,
    wfold: bool = True,
):
    """GSPMD train step over a (data, spatial) mesh.

    step(ts: TrainState, images, labels, edges, lr) -> (ts, metrics).
    Inputs are globally-shaped; place them with `put_batch(mesh, ...)`.
    Gradients/updates fall out of the partitioner (replicated params →
    psum'd cotangents); no shard_map, no manual collectives.
    """
    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.train.step import TrainState, _sgd

    img_s = image_sharding(mesh)
    rep = replicated(mesh)
    ts_s = TrainState(params=rep, state=rep, momentum=rep)
    hint = spp_hint(mesh)

    def loss_of(params, state, images, labels, edges):
        # Pallas kernels (ce_front, upsample_argmax inside FullLoss) are
        # opaque custom calls the SPMD partitioner cannot shard — trace
        # the XLA formulations instead (ops/pallas_gate.py)
        with no_pallas():
            outputs, new_state = M.apply(
                params,
                state,
                images,
                spec,
                train=True,
                compute_dtype=compute_dtype,
                stem_s2d=stem_s2d,
                wfold=wfold,
                shard_hint=hint,
            )
            loss, metrics = loss_fn(outputs, labels, edges)
        return loss, (new_state, metrics)

    @partial(
        jax.jit,
        donate_argnums=(0,),
        in_shardings=(ts_s, img_s, img_s, img_s, rep),
        out_shardings=(ts_s, rep),
    )
    def step(ts, images, labels, edges, lr):
        grad_fn = jax.value_and_grad(loss_of, has_aux=True)
        (_, (new_state, metrics)), grads = grad_fn(
            ts.params, ts.state, images, labels, edges
        )
        new_params, new_bufs = _sgd(
            ts.params, grads, ts.momentum, lr, momentum, weight_decay, nesterov
        )
        return TrainState(new_params, new_state, new_bufs), metrics

    return step


def make_spatial_eval_step(
    spec,
    loss_fn,
    mesh: Mesh,
    *,
    num_classes: int,
    compute_dtype=None,
    stem_s2d: bool = False,
    wfold: bool = True,
):
    """GSPMD validation step over the (data, spatial) mesh — same contract
    as train.step.make_eval_step: step(ts, images, labels, edges,
    sample_mask) -> (metrics, cms), cms (num_seg_outputs, C, C).

    This is what `--spatial` training validates through (round-2 advisor:
    the 1-D eval step put one FULL TEST.IMAGE_SIZE sample per device with
    unsharded H, defeating the flag's larger-than-one-chip use case). The
    program is global, so FullLoss's masked means and the bincount
    confusion matrices are already global values — no per-shard weighting
    needed; the partitioner shards the pixel work N×H and emits the
    reductions."""
    from pidnet_tpu.metrics import confusion_matrix
    from pidnet_tpu.models import pidnet as M
    from pidnet_tpu.ops.resize import resize_bilinear
    from pidnet_tpu.train.step import TrainState

    img_s = image_sharding(mesh)
    rep = replicated(mesh)
    batch_s = NamedSharding(mesh, P(DATA_AXIS))
    ts_s = TrainState(params=rep, state=rep, momentum=rep)
    hint = spp_hint(mesh)

    @partial(
        jax.jit,
        in_shardings=(ts_s, img_s, img_s, img_s, batch_s),
        out_shardings=(rep, rep),
    )
    def step(ts, images, labels, edges, sample_mask):
        with no_pallas():  # opaque custom calls can't be SPMD-partitioned
            outputs = M.apply(
                ts.params, ts.state, images, spec, train=False,
                compute_dtype=compute_dtype, stem_s2d=stem_s2d, wfold=wfold,
                shard_hint=hint,
            )
            loss, metrics = loss_fn(
                outputs, labels, edges, sample_mask=sample_mask
            )
        # global real-sample count (same contract as train.step's eval
        # metrics): engine.validate weights its meter by this so the
        # reported loss is the exact global average on every process
        metrics["weight"] = jnp.sum(sample_mask.astype(jnp.float32))
        # padding defense for the CMs: masked samples become all-ignore
        labels = jnp.where(
            sample_mask.reshape(-1, 1, 1) > 0, labels, loss_fn.ignore_label
        )
        h, w = labels.shape[1], labels.shape[2]
        cms = []
        for o in outputs[:-1]:
            seg = resize_bilinear(o, (h, w), loss_fn.align_corners)
            cm = confusion_matrix(seg, labels, num_classes, loss_fn.ignore_label)
            cms.append(cm.astype(jnp.float32))
        return metrics, jnp.stack(cms)

    return step


def put_batch(mesh: Mesh, *arrays):
    """Place host batch arrays on the (data, spatial) mesh: dims (N, H)
    sharded for image-like arrays (rank >= 2), N only for per-sample
    vectors (rank 1, e.g. the validation sample mask).

    Single-process: `arrays` are the GLOBAL batch. Multi-process (after
    `jax.distributed.initialize()`): each process passes its LOCAL batch
    rows at full H — the process's devices must cover whole rows of the
    (data, spatial) grid, i.e. `spatial` divides the local device count
    (enforced by tools/train.py) — and the global array is assembled via
    `make_array_from_process_local_data`, like parallel.mesh.shard_batch."""
    img_s = image_sharding(mesh)
    batch_s = NamedSharding(mesh, P(DATA_AXIS))
    multi = jax.process_count() > 1

    def put(a):
        a = np.asarray(a)
        s = img_s if a.ndim >= 2 else batch_s
        if multi:
            return jax.make_array_from_process_local_data(s, a)
        return jax.device_put(a, s)

    out = tuple(put(a) for a in arrays)
    return out if len(out) > 1 else out[0]
