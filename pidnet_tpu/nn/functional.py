"""Functional NHWC primitives for the TPU compute path.

Everything here is shape-static and jit-friendly. Convolutions take HWIO
weights and run on the MXU (optionally in bf16 with fp32 accumulation);
BatchNorm matches torch semantics (momentum-based running stats, biased
variance for normalization, unbiased for the running estimate, eps=1e-5)
so converted reference checkpoints produce identical activations
(reference: models/model_utils.py uses nn.BatchNorm2d(momentum=0.1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # reference models/pidnet.py:12 (bn_mom)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    groups: int = 1,
    compute_dtype=None,
    padding=None,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC, torch-style SAME-ish padding.

    All PIDNet convs use kernel k in {1,3} with padding k//2, so padding is
    derived from the kernel shape unless given explicitly. When
    `compute_dtype` is bf16 the matmul runs on the MXU in bf16 with fp32
    accumulation.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad = padding if padding is not None else (
        (kh // 2, kh // 2), (kw // 2, kw // 2)
    )
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = None  # native MXU precision for the requested dtype
        # keep in/out dtypes uniform so the conv VJP stays well-typed; the
        # MXU accumulates bf16 products in fp32 internally regardless
        preferred = compute_dtype
    else:
        w = w.astype(in_dtype)
        # fp32 parity path: TPU's default conv precision is bf16-decomposed,
        # which would break logit parity with the reference.
        precision = lax.Precision.HIGHEST
        preferred = jnp.float32
    strides = (stride, stride) if isinstance(stride, int) else tuple(stride)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred,
        precision=precision,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(in_dtype) if compute_dtype is None else y.astype(compute_dtype)


def batch_norm_infer(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
) -> jnp.ndarray:
    scale = gamma * lax.rsqrt(var + BN_EPS)
    shift = beta - mean * scale
    return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _batch_stats(x, reduce_axes, sample_weight):
    """fp32 (mean, mean_sq, count) over `reduce_axes` (axis 0 = samples).

    With `sample_weight` (N,) in {0,1}, statistics are weighted per sample
    — samples with weight 0 contribute NOTHING, so a batch padded to a
    sublane boundary (train/step.py pad_batch) computes bit-for-math the
    same statistics as the unpadded batch. The weight broadcast fuses into
    the reductions; no extra activation-sized tensors are materialized.
    """
    if sample_weight is None:
        n_static = 1
        for a in reduce_axes:
            n_static *= x.shape[a]
        mean = jnp.mean(x, axis=reduce_axes, dtype=jnp.float32)
        mean_sq = jnp.mean(lax.square(x.astype(jnp.float32)), axis=reduce_axes)
        return mean, mean_sq, jnp.float32(n_static)
    w = sample_weight.astype(jnp.float32).reshape(
        (-1,) + (1,) * (x.ndim - 1)
    )
    per_sample = 1
    for a in reduce_axes:
        if a != 0:
            per_sample *= x.shape[a]
    cnt = jnp.sum(sample_weight.astype(jnp.float32)) * per_sample
    xf = x.astype(jnp.float32)
    mean = jnp.sum(xf * w, axis=reduce_axes) / cnt
    mean_sq = jnp.sum(lax.square(xf) * w, axis=reduce_axes) / cnt
    return mean, mean_sq, cnt


def batch_norm_train(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    momentum: float = BN_MOMENTUM,
    axis_name: str | None = None,
    sample_weight: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training-mode BN. Returns (y, new_running_mean, new_running_var).

    With `axis_name` set, batch statistics are averaged across that mesh
    axis (sync BN). Without it, statistics are per-shard — exactly the
    reference's per-replica DataParallel BN (tools/train.py:136).
    `sample_weight` (N,) in {0,1} excludes padding samples from the
    statistics (see _batch_stats); padded rows are still normalized (their
    values are garbage, masked downstream in the loss).
    """
    # statistics always reduce in fp32 (preferred accumulation); the
    # normalization itself runs in the activation dtype so bf16 training
    # never materializes fp32 activation-sized intermediates
    mean, mean_sq, n = _batch_stats(x, (0, 1, 2), sample_weight)
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        mean_sq = lax.pmean(mean_sq, axis_name)
        n = n * lax.psum(1, axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + BN_EPS) * gamma
    shift = beta - mean * scale
    y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    # torch stores the *unbiased* variance in running_var
    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_mean = (1.0 - momentum) * running_mean + momentum * mean
    new_var = (1.0 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


def batch_norm_grouped(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    groups: int,
    train: bool,
    momentum: float = BN_MOMENTUM,
    axis_name: str | None = None,
    sample_weight: jnp.ndarray | None = None,
    count_scale: float = 1.0,
):
    """BatchNorm over an s2d-layout tensor whose channels are
    (block_a, block_b, o) = groups x O, with parameters/stats per original
    channel o. Statistics reduce over (N,H,W,blocks) — numerically the
    SAME statistics the normal-layout BN computes, so running stats and
    checkpoints are interchangeable with the standard path.

    `count_scale` corrects the element count when the layout carries
    padded slots that are guaranteed ZERO (ops/wfold mid layout: B+1
    blocks hold B*f real columns -> count_scale=B/(B+1)): zeros
    contribute nothing to the sums, so dividing by the scaled count gives
    the exact real-column statistics.

    Returns (y, new_running_mean, new_running_var) (running stats pass
    through unchanged when train=False)."""
    nb, hb, wb, c = x.shape
    o = c // groups
    xr = x.reshape(nb, hb, wb, groups, o)
    if train:
        mean, mean_sq, n = _batch_stats(xr, (0, 1, 2, 3), sample_weight)
        if count_scale != 1.0:
            inv = 1.0 / count_scale
            mean, mean_sq, n = mean * inv, mean_sq * inv, n * count_scale
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
            n = n * lax.psum(1, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_mean = (1.0 - momentum) * running_mean + momentum * mean
        new_var = (1.0 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_mean, new_var = running_mean, running_var
    scale = lax.rsqrt(var + BN_EPS) * gamma
    shift = beta - mean * scale
    y = x * jnp.tile(scale, groups).astype(x.dtype) + jnp.tile(shift, groups).astype(
        x.dtype
    )
    return y, new_mean, new_var


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """AvgPool2d with count_include_pad=True (torch default used by D/PAPPM,
    reference models/model_utils.py:118-132)."""
    xf = x.astype(jnp.float32)
    summed = lax.reduce_window(
        xf,
        0.0,
        lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (summed * (1.0 / (kernel * kernel))).astype(x.dtype)


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """MaxPool2d (torch semantics: padding never wins — -inf identity).
    Used by the BiSeNet ablation's ResNet-18 stem (reference
    models/others/resnet.py:61)."""
    # a literal init value keeps reduce_window reverse-mode differentiable
    init = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(
        jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d((1,1)): NHWC -> N11C."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)
