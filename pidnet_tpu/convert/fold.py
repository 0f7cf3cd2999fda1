"""BatchNorm folding for the inference/speed path.

The reference benchmarks a hand-edited BN-free model copy
(models/speed/pidnet_speed.py:37-40, README.md speed protocol). Here the
fold is automated from the traced model spec:

- every Conv->BN pair (recorded by `_TraceOps.fold_pairs`) collapses into a
  biased conv:  w' = w * g/sqrt(v+eps),  b' = beta - g*m/sqrt(v+eps);
- every remaining standalone BN (the pre-activation ones in segmenthead /
  DAPPM / PAPPM / Bag) becomes a per-channel affine (scale, shift), which
  XLA fuses into neighbouring ops.

`models.pidnet.apply(..., folded=True)` consumes the result.
"""

from __future__ import annotations

import jax.numpy as jnp

from pidnet_tpu.models import pidnet as _pidnet
from pidnet_tpu.nn.functional import BN_EPS


def calibrate_bn(params: dict, state: dict, spec, x, iters: int = 12) -> dict:
    """Settle BN running stats on real activations via train-mode forwards
    (no gradient step) and return the new state.

    At random init BN is the identity (mean 0 / var 1 / gamma 1), so
    activations — and logits — explode with depth (measured logit std
    80-235 at seed 0-2 on the Frankfurt frame, vs O(10) for a trained
    net). Any metric computed on such weights is dominated by the draw:
    bf16-vs-fp32 argmax agreement swung 0.953-0.997 across seeds. A few
    train-mode forwards converge the running stats toward the actual
    activation statistics (torch momentum-0.1 EMA), normalizing the
    network exactly the way real training's first steps do; bench.py
    folds THESE stats so its numerics gate measures the pipeline, not
    the luck of the init draw."""
    import jax as _jax

    @_jax.jit
    def one(st):
        _, new_state = _pidnet.apply(params, st, x, spec, train=True)
        return new_state

    for _ in range(iters):
        state = one(state)
    return state


def fold_params(params: dict, state: dict, spec) -> dict:
    traced = _pidnet.trace_spec(spec)
    folded: dict[str, jnp.ndarray] = {}
    paired_bns = {bn for _, bn in traced.fold_pairs}

    for conv_name, bn_name in traced.fold_pairs:
        w = params[conv_name + ".weight"]  # HWIO
        g = params[bn_name + ".weight"]
        b = params[bn_name + ".bias"]
        m = state[bn_name + ".running_mean"]
        v = state[bn_name + ".running_var"]
        scale = g * jnp.reciprocal(jnp.sqrt(v + BN_EPS))  # per output channel
        folded[conv_name + ".weight"] = w * scale  # broadcasts over O axis
        bias = b - m * scale
        if conv_name + ".bias" in params:  # conv already had a bias
            bias = bias + params[conv_name + ".bias"] * scale
        folded[conv_name + ".bias"] = bias

    for name, (k, cin_g, cout, has_bias) in traced.convs.items():
        if name + ".weight" not in folded:  # conv not followed by BN
            folded[name + ".weight"] = params[name + ".weight"]
            if has_bias:
                folded[name + ".bias"] = params[name + ".bias"]

    # standalone BNs (the pre-activation ones in segmenthead/DAPPM/PAPPM/
    # Bag) become per-channel affines
    for bn_name in traced.bns:
        if bn_name in paired_bns:
            continue  # merged into a conv above
        g = params[bn_name + ".weight"]
        b = params[bn_name + ".bias"]
        m = state[bn_name + ".running_mean"]
        v = state[bn_name + ".running_var"]
        scale = g * jnp.reciprocal(jnp.sqrt(v + BN_EPS))
        folded[bn_name + ".scale"] = scale
        folded[bn_name + ".shift"] = b - m * scale

    # space-to-depth variants of the front of the network (stem + layer1 +
    # layer2.0's strided convs — identical math, MXU-friendly; consumed by
    # apply(..., stem_s2d=True), see models.pidnet._ApplyOps.stem_front).
    # Only architectures with the PIDNet/DDRNet stem layout have them;
    # other specs (e.g. BiSeNet) simply fold without an s2d front.
    if "conv1.0.weight" not in folded or not hasattr(spec, "m"):
        return folded

    from pidnet_tpu.ops.space_to_depth import (
        s2d_conv_bias,
        s2d_conv_weight,
        s2d_stem_wide_weight,
    )

    def s2d(name, in_block, stride):
        K, _ = s2d_conv_weight(folded[name + ".weight"], in_block, stride)
        folded[f"s2d.{name}.weight"] = jnp.asarray(K)
        folded[f"s2d.{name}.bias"] = jnp.asarray(
            s2d_conv_bias(folded[name + ".bias"], in_block // stride)
        )

    folded["s2d.conv1.0.wide_weight"] = jnp.asarray(
        s2d_stem_wide_weight(folded["conv1.0.weight"])
    )
    folded["s2d.conv1.0.bias"] = s2d_conv_bias(folded["conv1.0.bias"], 4)
    s2d("conv1.3", 4, 2)
    for i in range(spec.m):
        s2d(f"layer1.{i}.conv1", 2, 1)
        s2d(f"layer1.{i}.conv2", 2, 1)
    s2d("layer2.0.conv1", 2, 2)
    s2d("layer2.0.downsample.0", 2, 2)
    return folded
