"""PIDNet — three-branch (P=detail, I=context, D=boundary) real-time
semantic segmentation network, TPU-native functional implementation.

Architecture parity target: reference models/pidnet.py:17-227 and
models/model_utils.py:12-377 (PyTorch). This is a from-scratch NHWC
JAX implementation:

- parameters live in a flat ``{torch-style name: array}`` dict (HWIO conv
  weights), which makes the checkpoint converter (convert/torch_weights.py)
  and BatchNorm folding (convert/fold.py) mechanical;
- a single wiring function `_forward` drives both shape-traced parameter
  initialization (via `jax.eval_shape`, zero FLOPs) and the actual forward
  pass, so init and apply can never diverge;
- all interior bilinear upsampling uses align_corners=False
  (reference models/pidnet.py:13 ``algc``), including PagFM's
  (reference models/model_utils.py:300,308);
- training mode (`augment=True`) returns ``[p_logits, logits, d_logits]``
  at 1/8 input resolution, matching reference models/pidnet.py:177-180.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pidnet_tpu.nn.functional import (
    avg_pool2d,
    batch_norm_infer,
    batch_norm_train,
    conv2d,
    global_avg_pool,
    relu,
    sigmoid,
)
from pidnet_tpu.ops.resize import resize_bilinear

ALGC = False  # align_corners for all interior resizes (reference pidnet.py:13)


@dataclass(frozen=True)
class PIDNetSpec:
    m: int = 2
    n: int = 3
    num_classes: int = 19
    planes: int = 64
    ppm_planes: int = 96
    head_planes: int = 128
    augment: bool = True


def spec_for(name: str, num_classes: int, augment: bool) -> PIDNetSpec:
    """Variant selection by substring, matching reference
    models/pidnet.py:186-191 ('s' wins over 'm', else L)."""
    if "s" in name:
        return PIDNetSpec(2, 3, num_classes, 32, 96, 128, augment)
    if "m" in name:
        return PIDNetSpec(2, 3, num_classes, 64, 96, 128, augment)
    return PIDNetSpec(3, 4, num_classes, 64, 112, 256, augment)


# ---------------------------------------------------------------------------
# Ops providers: Apply executes; Trace records the parameter spec.
# ---------------------------------------------------------------------------


class _ApplyOps:
    def __init__(
        self,
        params: dict,
        state: dict,
        *,
        train: bool,
        sync_axis: str | None,
        compute_dtype,
        folded: bool,
        stem_s2d: bool = False,
        wfold: bool = False,
        wfold_region=False,
        shard_hint=None,
        sample_weight=None,
    ):
        self.params = params
        self.state = state
        self.train = train
        self.sync_axis = sync_axis
        self.compute_dtype = compute_dtype
        self.folded = folded
        self.stem_s2d = stem_s2d
        self.wfold = wfold
        self.wfold_region = wfold_region
        self.shard_hint = shard_hint
        self.sample_weight = sample_weight
        self.new_state: dict = {}

    def stem_front(self, x, spec):
        """Stem + layer1 + layer2 entirely in space-to-depth space (folded
        inference only; weights prebuilt by convert/fold.py from the traced
        kernels — identical math, see ops/space_to_depth.py). Every tensor
        keeps >=128 channels so the MXU stays occupied and XLA stops
        inserting layout-conversion copies; layer2's stride-2 conv absorbs
        the final depth-to-space for free. Returns relu(layer2) at 1/8."""
        cd = self.compute_dtype
        P10, P11, P00 = ((1, 0), (1, 0)), ((1, 1), (1, 1)), ((0, 0), (0, 0))

        def cv(name, z, pad):
            return conv2d(
                z,
                self.params[f"s2d.{name}.weight"],
                self.params[f"s2d.{name}.bias"],
                stride=1,
                compute_dtype=cd,
                padding=pad,
            )

        # transpose-free first conv: the raw NHWC image viewed as
        # (N,H,W/8,8*3) is a free reshape; a (9,2)-kernel stride-(8,1)
        # conv emits the s2d4 layout directly (ops/space_to_depth.py).
        # Callers may pass the view pre-made (ops.space_to_depth.stem_view,
        # free on host) so the graph holds NO reshape at all and XLA gives
        # the entry argument the conv's preferred layout — otherwise the
        # in-graph reshape costs a relayout copy (layout_probe.py).
        n, h, w, c = x.shape
        z = x.reshape(n, h, w // 8, 8 * c) if c == 3 else x
        y = conv2d(
            z,
            self.params["s2d.conv1.0.wide_weight"],
            self.params["s2d.conv1.0.bias"],
            stride=(8, 1),
            compute_dtype=cd,
            padding=P10,
        )
        y = relu(y)  # s2d4 of conv1 out
        y = relu(cv("conv1.3", y, P10))  # s2d2 of stem out
        for i in range(spec.m):  # layer1 basic blocks, all in s2d2
            out = relu(cv(f"layer1.{i}.conv1", y, P11))
            out = cv(f"layer1.{i}.conv2", out, P11)
            y = out + y
            if i < spec.m - 1:
                y = relu(y)
        y = relu(y)  # external relu after layer1 (pidnet.py:143)
        # layer2 block 0: the stride-2 convs return to normal layout
        out = relu(cv("layer2.0.conv1", y, P10))
        out = conv2d(
            out,
            self.params["layer2.0.conv2.weight"],
            self.params["layer2.0.conv2.bias"],
            compute_dtype=cd,
        )
        y = out + cv("layer2.0.downsample.0", y, P00)
        y = relu(y)
        for i in range(1, spec.m):  # remaining layer2 blocks, normal space
            y = _basic_block(
                self, f"layer2.{i}", y, spec.planes * 2, 1, no_relu=(i == spec.m - 1)
            )
        return relu(y)

    def stem_front_live(self, x, spec):
        """s2d front for the UNFOLDED path (training and eval-mode BN).

        Conv kernels are rebuilt on the fly from the canonical 3x3/1x1
        parameters (`w.reshape(-1)[idx] * mask`), so gradients flow back to
        the original weights and checkpoints are byte-compatible with the
        normal path; BatchNorm statistics reduce per original channel over
        the s2d blocks (nn.functional.batch_norm_grouped) — identical math
        to the normal layout, ~2x fewer layout copies at train time."""
        from pidnet_tpu.nn.functional import batch_norm_grouped

        specs = _live_s2d_specs(spec.m, spec.planes)
        cd = self.compute_dtype

        def cv(name, z, bias=False):
            eq, E1, E2, out_shape, stride, pad, _ = specs[name]
            w = self.params[name + ".weight"]
            # expanded kernel = two micro one-hot contractions (see
            # ops.space_to_depth.s2d_axis_factor); the transpose of the
            # einsum scatter-adds cotangents back onto the canonical weight
            K = jnp.einsum(eq, jnp.asarray(E1), jnp.asarray(E2), w).reshape(out_shape)
            b = None
            if bias:
                b0 = self.params[name + ".bias"]
                b = jnp.tile(b0, K.shape[-1] // b0.shape[0])
            return conv2d(z, K, b, stride=stride, compute_dtype=cd, padding=pad)

        def bn(name, z, groups):
            y, nm, nv = batch_norm_grouped(
                z,
                self.params[name + ".weight"],
                self.params[name + ".bias"],
                self.state[name + ".running_mean"],
                self.state[name + ".running_var"],
                groups=groups,
                train=self.train,
                axis_name=self.sync_axis,
                sample_weight=self.sample_weight,
            )
            if self.train:
                self.new_state[name + ".running_mean"] = nm
                self.new_state[name + ".running_var"] = nv
            return y

        n, h, w, c = x.shape
        z = x.reshape(n, h, w // 8, 8 * c)  # free view (W-only s2d)
        y = relu(bn("conv1.1", cv("conv1.0", z, bias=True), 16))
        y = relu(bn("conv1.4", cv("conv1.3", y, bias=True), 4))
        for i in range(spec.m):  # layer1 basic blocks, all in s2d2
            out = relu(bn(f"layer1.{i}.bn1", cv(f"layer1.{i}.conv1", y), 4))
            out = bn(f"layer1.{i}.bn2", cv(f"layer1.{i}.conv2", out), 4)
            y = out + y
            if i < spec.m - 1:
                y = relu(y)
        y = relu(y)
        # layer2 block 0: stride-2 convs return to normal layout
        out = relu(self.bn("layer2.0.bn1", cv("layer2.0.conv1", y)))
        out = self.convbn("layer2.0.conv2", "layer2.0.bn2", out, spec.planes * 2, 3)
        y = out + self.bn("layer2.0.downsample.1", cv("layer2.0.downsample.0", y))
        y = relu(y)
        for i in range(1, spec.m):
            y = _basic_block(
                self, f"layer2.{i}", y, spec.planes * 2, 1, no_relu=(i == spec.m - 1)
            )
        return relu(y)

    def conv(self, name, x, cout, k, stride=1, groups=1, bias=False):
        w = self.params[name + ".weight"]
        b = self.params.get(name + ".bias") if (bias or self.folded) else None
        return conv2d(
            x, w, b, stride=stride, groups=groups, compute_dtype=self.compute_dtype
        )

    def bn(self, name, x):
        if self.folded:
            scale = self.params[name + ".scale"].astype(x.dtype)
            shift = self.params[name + ".shift"].astype(x.dtype)
            return x * scale + shift
        gamma = self.params[name + ".weight"]
        beta = self.params[name + ".bias"]
        rm = self.state[name + ".running_mean"]
        rv = self.state[name + ".running_var"]
        if self.train:
            y, nm, nv = batch_norm_train(
                x, gamma, beta, rm, rv, axis_name=self.sync_axis,
                sample_weight=self.sample_weight,
            )
            self.new_state[name + ".running_mean"] = nm
            self.new_state[name + ".running_var"] = nv
            return y
        return batch_norm_infer(x, gamma, beta, rm, rv)

    def convbn(self, conv_name, bn_name, x, cout, k, stride=1, groups=1, bias=False):
        """Conv directly followed by BN — foldable at inference."""
        if self.folded:
            return self.conv(conv_name, x, cout, k, stride, groups)
        return self.bn(bn_name, self.conv(conv_name, x, cout, k, stride, groups, bias))


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _live_s2d_specs(m: int, planes: int):
    """Static (einsum, E1, E2, out_shape, stride, padding, bn_groups) per
    front conv for the live (unfolded) s2d path; see ops/space_to_depth.py
    (`s2d_axis_factor` / `s2d_stem_axis_factors`)."""
    from pidnet_tpu.ops.space_to_depth import (
        s2d_axis_factor,
        s2d_stem_axis_factors,
    )

    CONV_EQ = "PAak,QBbl,klco->PQABcabo"
    P10, P11, P00 = ((1, 0), (1, 0)), ((1, 1), (1, 1)), ((0, 0), (0, 0))
    p = planes
    specs = {}
    E1w, E2w = s2d_stem_axis_factors()
    specs["conv1.0"] = (
        "hak,QBbl,klco->hQBcabo", E1w, E2w, (9, 2, 8 * 3, 16 * p),
        (8, 1), P10, 16,
    )

    def conv_spec(k, in_block, stride, cin, cout, pad, groups):
        E, _ = s2d_axis_factor(k, in_block, stride)
        T, ob = E.shape[0], in_block // stride
        shape = (T, T, in_block * in_block * cin, ob * ob * cout)
        return (CONV_EQ, E, E, shape, 1, pad, groups)

    specs["conv1.3"] = conv_spec(3, 4, 2, p, p, P10, 4)
    for i in range(m):
        for cname in ("conv1", "conv2"):
            specs[f"layer1.{i}.{cname}"] = conv_spec(3, 2, 1, p, p, P11, 4)
    specs["layer2.0.conv1"] = conv_spec(3, 2, 2, p, p * 2, P10, 1)
    specs["layer2.0.downsample.0"] = conv_spec(1, 2, 2, p, p * 2, P00, 1)
    return specs


class _TraceOps:
    """Records parameter/state shapes; runs under jax.eval_shape."""

    def __init__(self):
        self.convs: dict[str, tuple] = {}  # name -> (k, cin_g, cout, bias)
        self.bns: dict[str, int] = {}  # name -> channels
        self.fold_pairs: list[tuple[str, str]] = []  # (conv, bn) foldable
        self.compute_dtype = jnp.float32

    def conv(self, name, x, cout, k, stride=1, groups=1, bias=False):
        cin = x.shape[-1]
        assert cin % groups == 0, (name, cin, groups)
        self.convs[name] = (k, cin // groups, cout, bias)
        w = jnp.zeros((k, k, cin // groups, cout), jnp.float32)
        b = jnp.zeros((cout,), jnp.float32) if bias else None
        return conv2d(x, w, b, stride=stride, groups=groups)

    def bn(self, name, x):
        self.bns[name] = x.shape[-1]
        return x

    def convbn(self, conv_name, bn_name, x, cout, k, stride=1, groups=1, bias=False):
        self.fold_pairs.append((conv_name, bn_name))
        return self.bn(bn_name, self.conv(conv_name, x, cout, k, stride, groups, bias))



# ---------------------------------------------------------------------------
# Blocks (reference models/model_utils.py)
# ---------------------------------------------------------------------------


def _basic_block(ops, prefix, x, planes, stride=1, no_relu=False):
    """ResNet basic block (reference model_utils.py:12-46), expansion 1."""
    out = relu(ops.convbn(f"{prefix}.conv1", f"{prefix}.bn1", x, planes, 3, stride))
    out = ops.convbn(f"{prefix}.conv2", f"{prefix}.bn2", out, planes, 3)
    if stride != 1 or x.shape[-1] != planes:
        residual = ops.convbn(
            f"{prefix}.downsample.0", f"{prefix}.downsample.1", x, planes, 1, stride
        )
    else:
        residual = x
    out = out + residual
    return out if no_relu else relu(out)


def _bottleneck(ops, prefix, x, planes, stride=1, no_relu=True):
    """Bottleneck with expansion 2 (reference model_utils.py:48-87)."""
    cout = planes * 2
    out = relu(ops.convbn(f"{prefix}.conv1", f"{prefix}.bn1", x, planes, 1))
    out = relu(ops.convbn(f"{prefix}.conv2", f"{prefix}.bn2", out, planes, 3, stride))
    out = ops.convbn(f"{prefix}.conv3", f"{prefix}.bn3", out, cout, 1)
    if stride != 1 or x.shape[-1] != cout:
        residual = ops.convbn(
            f"{prefix}.downsample.0", f"{prefix}.downsample.1", x, cout, 1, stride
        )
    else:
        residual = x
    out = out + residual
    return out if no_relu else relu(out)


_BLOCK = {"basic": (_basic_block, False), "bottleneck": (_bottleneck, True)}


# ---------------------------------------------------------------------------
# W-folded blocks (ops/wfold.py): the P/D branch stages run at 1/8 res
# with 32-64 channels — 25-50% lane fill on the 128-wide TPU lane axis.
# Folding W-parity into channels (a FREE reshape for NHWC) restores full
# lanes; 3x3 kernels are re-indexed over folded blocks by one-hot einsums
# so gradients flow to the canonical torch-named weights. Exact math
# (fp32-bit-exact vs the unfolded blocks, tests/test_wfold.py).
# ---------------------------------------------------------------------------


def _wf_conv(ops, name, xf, E, pad_w, f):
    from pidnet_tpu.ops.wfold import expand_weight

    w = ops.params[name + ".weight"]
    K = expand_weight(w, E)
    b = None
    if ops.folded:
        b0 = ops.params.get(name + ".bias")
        if b0 is not None:
            b = jnp.tile(b0, f)
    pad_h = (w.shape[0] // 2,) * 2
    return conv2d(
        xf, K, b, stride=1, compute_dtype=ops.compute_dtype,
        padding=(pad_h, pad_w),
    )


def _wf_bn(ops, name, xf, f, count_scale=1.0):
    from pidnet_tpu.nn.functional import batch_norm_grouped

    # folded mode never reaches here: _wf_convbn returns the conv output
    # (BN folded into the conv weights/bias) before calling _wf_bn
    assert not ops.folded, name
    y, nm, nv = batch_norm_grouped(
        xf,
        ops.params[name + ".weight"],
        ops.params[name + ".bias"],
        ops.state[name + ".running_mean"],
        ops.state[name + ".running_var"],
        groups=f,
        train=ops.train,
        axis_name=ops.sync_axis,
        sample_weight=ops.sample_weight,
        count_scale=count_scale,
    )
    if ops.train:
        ops.new_state[name + ".running_mean"] = nm
        ops.new_state[name + ".running_var"] = nv
    return y


def _wf_convbn(ops, conv_name, bn_name, xf, E, pad_w, f, count_scale=1.0):
    y = _wf_conv(ops, conv_name, xf, E, pad_w, f)
    return y if ops.folded else _wf_bn(ops, bn_name, y, f, count_scale)


def _wf_basic_block(ops, prefix, xf, planes, f, no_relu=False):
    """Basic block on a W-folded tensor: conv1 maps to the shifted MID
    layout (B+1 blocks, 2-tap window — 4/3 the MACs instead of the
    canonical form's 2x), conv2 maps back. The mid layout's f garbage
    columns are zeroed before BN statistics and again after BN/ReLU
    re-bias them (mask multiplies fuse into the elementwise chains)."""
    from pidnet_tpu.ops.wfold import mid_mask, pair1_factor, pair2_factor

    blocks = xf.shape[2]
    e1, e2 = pair1_factor(f), pair2_factor(f)
    mid = _wf_conv(ops, f"{prefix}.conv1", xf, e1, (1, 1), f)
    mask = jnp.asarray(mid_mask(blocks + 1, f, planes), mid.dtype)
    if ops.folded:
        mid = relu(mid) * mask
    else:
        mid = _wf_bn(
            ops, f"{prefix}.bn1", mid * mask, f, count_scale=blocks / (blocks + 1)
        )
        mid = relu(mid) * mask
    out = _wf_convbn(ops, f"{prefix}.conv2", f"{prefix}.bn2", mid, e2, (0, 0), f)
    if xf.shape[-1] != f * planes:
        from pidnet_tpu.ops.wfold import eye_factor

        residual = _wf_convbn(
            ops, f"{prefix}.downsample.0", f"{prefix}.downsample.1", xf,
            eye_factor(f), (0, 0), f,
        )
    else:
        residual = xf
    out = out + residual
    return out if no_relu else relu(out)


def _wf_bottleneck(ops, prefix, xf, planes, f, no_relu=True):
    """Bottleneck on a W-folded tensor: 1x1s are block-diagonal
    (MAC-neutral), the single 3x3 uses the canonical->canonical 3-block
    window (exact SAME padding, no masking, f x MACs)."""
    from pidnet_tpu.ops.wfold import eye_factor, single_factor

    cout = planes * 2
    ee, es = eye_factor(f), single_factor(f)
    out = relu(_wf_convbn(ops, f"{prefix}.conv1", f"{prefix}.bn1", xf, ee, (0, 0), f))
    out = relu(_wf_convbn(ops, f"{prefix}.conv2", f"{prefix}.bn2", out, es, (1, 1), f))
    out = _wf_convbn(ops, f"{prefix}.conv3", f"{prefix}.bn3", out, ee, (0, 0), f)
    if xf.shape[-1] != f * cout:
        residual = _wf_convbn(
            ops, f"{prefix}.downsample.0", f"{prefix}.downsample.1", xf,
            ee, (0, 0), f,
        )
    else:
        residual = xf
    out = out + residual
    return out if no_relu else relu(out)


_WF_BLOCK = {"basic": (_wf_basic_block, False), "bottleneck": (_wf_bottleneck, True)}


def _wf_factor(ops, x, planes):
    from pidnet_tpu.ops.wfold import fold_factor

    if not getattr(ops, "wfold", False):
        return None
    return fold_factor(planes, x.shape[2])


def _stage_no_relu(i: int, blocks: int, default: bool) -> bool:
    """Per-block no_relu policy of a sequential stage (reference
    pidnet.py:103-121): the FIRST block keeps the block type's default;
    later blocks relu except the stage's last. One source of truth for
    the normal and W-folded layouts."""
    return default if i == 0 else i == blocks - 1


def _wf_stage(ops, prefix, xf, block, planes, blocks, f):
    """Sequential stage on an ALREADY-folded tensor (folded in, folded
    out) — the stay-folded region building block."""
    fn, default_no_relu = _WF_BLOCK[block]
    for i in range(blocks):
        no_relu = _stage_no_relu(i, blocks, default_no_relu)
        xf = fn(ops, f"{prefix}.{i}", xf, planes, f, no_relu)
    return xf


def _wf_single(ops, prefix, xf, block, planes, f):
    fn, _ = _WF_BLOCK[block]
    return fn(ops, prefix, xf, planes, f, no_relu=True)


def _wf_layer(ops, prefix, x, block, planes, blocks):
    """W-folded `_layer` (stride-1 stages only); falls back to the normal
    layout when folding is off or not applicable (C>=128, odd widths)."""
    f = _wf_factor(ops, x, planes)
    if f is None:
        return _layer(ops, prefix, x, block, planes, blocks)
    from pidnet_tpu.ops.wfold import wfold, wunfold

    return wunfold(_wf_stage(ops, prefix, wfold(x, f), block, planes, blocks, f), f)


def _wf_single_layer(ops, prefix, x, block, planes):
    f = _wf_factor(ops, x, planes)
    if f is None:
        return _single_layer(ops, prefix, x, block, planes)
    from pidnet_tpu.ops.wfold import wfold, wunfold

    fn, _ = _WF_BLOCK[block]
    return wunfold(fn(ops, prefix, wfold(x, f), planes, f, no_relu=True), f)


def _layer(ops, prefix, x, block, planes, blocks, stride=1):
    """Sequential residual stage (reference pidnet.py:103-121): last block
    no_relu=True; a single-block stage keeps the block's default no_relu."""
    fn, default_no_relu = _BLOCK[block]
    for i in range(blocks):
        s = stride if i == 0 else 1
        x = fn(ops, f"{prefix}.{i}", x, planes, s,
               _stage_no_relu(i, blocks, default_no_relu))
    return x


def _single_layer(ops, prefix, x, block, planes, stride=1):
    """_make_single_layer (reference pidnet.py:123-134): bare block module
    (no `.N` index in parameter names), always no_relu=True."""
    fn, _ = _BLOCK[block]
    return fn(ops, prefix, x, planes, stride, no_relu=True)


def _segmenthead(ops, prefix, x, interplanes, outplanes, scale_factor=None):
    """Pre-activation seg head (reference model_utils.py:89-112)."""
    y = ops.conv(f"{prefix}.conv1", relu(ops.bn(f"{prefix}.bn1", x)), interplanes, 3)
    out = ops.conv(
        f"{prefix}.conv2", relu(ops.bn(f"{prefix}.bn2", y)), outplanes, 1, bias=True
    )
    if scale_factor is not None:
        oh = y.shape[1] * scale_factor
        ow = y.shape[2] * scale_factor
        out = resize_bilinear(out, (oh, ow), ALGC)
    return out


def _pagfm(ops, prefix, x, y, mid, *, after_relu=False, with_channel=False):
    """Pixel-attention-guided fusion (reference model_utils.py:268-312).
    Its interior resizes hard-code align_corners=False (:300, :308)."""
    hw = (x.shape[1], x.shape[2])
    if after_relu:
        x, y = relu(x), relu(y)
    y_q = ops.convbn(f"{prefix}.f_y.0", f"{prefix}.f_y.1", y, mid, 1)
    y_q = resize_bilinear(y_q, hw, False)
    x_k = ops.convbn(f"{prefix}.f_x.0", f"{prefix}.f_x.1", x, mid, 1)
    if with_channel:
        sim = sigmoid(
            ops.convbn(f"{prefix}.up.0", f"{prefix}.up.1", x_k * y_q, x.shape[-1], 1)
        )
    else:
        sim = sigmoid(jnp.sum(x_k * y_q, axis=-1, keepdims=True))
    y_up = resize_bilinear(y, hw, False)
    return (1 - sim) * x + sim * y_up


def _pagfm_wf(ops, prefix, xf, y, mid, f, *, after_relu=False):
    """PagFM with the P-branch input in W-folded layout (the stay-folded
    region; with_channel=False form only — stock PIDNet's, reference
    model_utils.py:268-312).

    Folded-exact recomposition: f_x is the eye-expanded block-diagonal
    1x1; the two upsamples of the lower-res partner enter folded space
    through `ops.resize.resize_wfold` (constant-tap MXU conv, no
    relayout; oracle-tested in tests/test_resize_wfold.py); the
    per-pixel channel sum runs per folded group via a minor-axis
    (f, mid) split-sum, and sim broadcasts back over each group's `mid`
    channels with jnp.repeat — both fuse into the elementwise blend.
    Matches `_pagfm` on the unfolded tensor (tests/test_wfold_region.py)."""
    from pidnet_tpu.ops.resize import resize_wfold
    from pidnet_tpu.ops.wfold import eye_factor

    n, h, b, fc = xf.shape
    s = h // y.shape[1]  # 2 for pag3 (1/16 partner), 4 for pag4 (1/32)
    if after_relu:
        xf, y = relu(xf), relu(y)
    y_q = ops.convbn(f"{prefix}.f_y.0", f"{prefix}.f_y.1", y, mid, 1)
    y_qf = resize_wfold(y_q, f, s)
    x_kf = _wf_convbn(
        ops, f"{prefix}.f_x.0", f"{prefix}.f_x.1", xf, eye_factor(f), (0, 0), f
    )
    prod = (x_kf * y_qf).reshape(n, h, b, f, mid)
    sim = sigmoid(jnp.sum(prod, axis=-1))  # (n,h,b,f): one scalar per column
    simf = jnp.repeat(sim, fc // f, axis=-1)  # group g -> channels g*C..(g+1)*C
    y_upf = resize_wfold(y, f, s)
    return (1 - simf) * xf + simf * y_upf


def _scale_branch(ops, prefix, x, pooled, bp, hw):
    """One pooled PPM branch: pool -> BN -> ReLU -> 1x1 conv -> upsample."""
    y = ops.conv(f"{prefix}.3", relu(ops.bn(f"{prefix}.1", pooled)), bp, 1)
    return resize_bilinear(y, hw, ALGC)


def _pappm(ops, prefix, x, branch_planes, outplanes):
    """Parallel aggregation PPM for S/M (reference model_utils.py:196-265)."""
    hw = (x.shape[1], x.shape[2])
    bp = branch_planes
    x0 = ops.conv(f"{prefix}.scale0.2", relu(ops.bn(f"{prefix}.scale0.0", x)), bp, 1)
    scales = [
        _scale_branch(ops, f"{prefix}.scale1", x, avg_pool2d(x, 5, 2, 2), bp, hw) + x0,
        _scale_branch(ops, f"{prefix}.scale2", x, avg_pool2d(x, 9, 4, 4), bp, hw) + x0,
        _scale_branch(ops, f"{prefix}.scale3", x, avg_pool2d(x, 17, 8, 8), bp, hw) + x0,
        _scale_branch(ops, f"{prefix}.scale4", x, global_avg_pool(x), bp, hw) + x0,
    ]
    cat = jnp.concatenate(scales, axis=-1)
    scale_out = ops.conv(
        f"{prefix}.scale_process.2",
        relu(ops.bn(f"{prefix}.scale_process.0", cat)),
        bp * 4,
        3,
        groups=4,
    )
    merged = jnp.concatenate([x0, scale_out], axis=-1)
    out = ops.conv(
        f"{prefix}.compression.2",
        relu(ops.bn(f"{prefix}.compression.0", merged)),
        outplanes,
        1,
    )
    shortcut = ops.conv(
        f"{prefix}.shortcut.2", relu(ops.bn(f"{prefix}.shortcut.0", x)), outplanes, 1
    )
    return out + shortcut


def _dappm(ops, prefix, x, branch_planes, outplanes):
    """Deep aggregation PPM for L (reference model_utils.py:114-194):
    sequential refinement across scales through 3x3 `process` convs."""
    hw = (x.shape[1], x.shape[2])
    bp = branch_planes
    feats = [ops.conv(f"{prefix}.scale0.2", relu(ops.bn(f"{prefix}.scale0.0", x)), bp, 1)]
    pools = [
        avg_pool2d(x, 5, 2, 2),
        avg_pool2d(x, 9, 4, 4),
        avg_pool2d(x, 17, 8, 8),
        global_avg_pool(x),
    ]
    for i, pooled in enumerate(pools, start=1):
        up = _scale_branch(ops, f"{prefix}.scale{i}", x, pooled, bp, hw)
        y = ops.conv(
            f"{prefix}.process{i}.2",
            relu(ops.bn(f"{prefix}.process{i}.0", up + feats[-1])),
            bp,
            3,
        )
        feats.append(y)
    cat = jnp.concatenate(feats, axis=-1)
    out = ops.conv(
        f"{prefix}.compression.2",
        relu(ops.bn(f"{prefix}.compression.0", cat)),
        outplanes,
        1,
    )
    shortcut = ops.conv(
        f"{prefix}.shortcut.2", relu(ops.bn(f"{prefix}.shortcut.0", x)), outplanes, 1
    )
    return out + shortcut


def _light_bag(ops, prefix, p, i, d, outplanes):
    """S/M fusion (reference model_utils.py:314-334)."""
    att = sigmoid(d)
    p_add = ops.convbn(f"{prefix}.conv_p.0", f"{prefix}.conv_p.1", (1 - att) * i + p, outplanes, 1)
    i_add = ops.convbn(f"{prefix}.conv_i.0", f"{prefix}.conv_i.1", i + att * p, outplanes, 1)
    return p_add + i_add


def _bag(ops, prefix, p, i, d, outplanes):
    """L fusion (reference model_utils.py:363-377)."""
    att = sigmoid(d)
    x = att * p + (1 - att) * i
    return ops.conv(f"{prefix}.conv.2", relu(ops.bn(f"{prefix}.conv.0", x)), outplanes, 3)


def _ddfm_v2(ops, prefix, p, i, d, outplanes):
    """Pre-activated Light_Bag variant (reference model_utils.py:337-361).
    Unused by stock PIDNet; kept as a pluggable fusion extension point."""
    att = sigmoid(d)

    def branch(name, z):
        z = relu(ops.bn(f"{prefix}.{name}.0", z))
        return ops.convbn(f"{prefix}.{name}.2", f"{prefix}.{name}.3", z, outplanes, 1)

    return branch("conv_p", (1 - att) * i + p) + branch("conv_i", i + att * p)


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------


def _hint(ops, name: str, x):
    """Optional partitioning hint (parallel/spatial.py): lets a sharded
    caller re-constrain layouts at named points without any mesh knowledge
    living in the model. Identity unless the caller installed a hook."""
    h = getattr(ops, "shard_hint", None)
    return h(name, x) if h is not None else x


def _forward(ops, x, spec: PIDNetSpec):
    """Reference models/pidnet.py:136-182, NHWC.

    `x` is either the raw (N,H,W,3) image batch or — folded stem_s2d only —
    its free W-s2d view (N,H,W/8,24) from ops.space_to_depth.stem_view
    (detected by the channel count; PIDNet input is always RGB)."""
    p = spec.planes
    w_full = x.shape[2] * 8 if x.shape[-1] == 24 else x.shape[2]
    h8, w8 = x.shape[1] // 8, w_full // 8

    if getattr(ops, "stem_s2d", False):
        # stem+layer1+layer2 in space-to-depth space (folded: prebuilt
        # kernels; unfolded: kernels derived live from canonical params)
        x = ops.stem_front(x, spec) if ops.folded else ops.stem_front_live(x, spec)
    else:
        # stem: /4 (reference pidnet.py:24-31; these two convs keep the
        # torch default bias=True — the only biased convs outside heads)
        x = relu(ops.convbn("conv1.0", "conv1.1", x, p, 3, 2, bias=True))
        x = relu(ops.convbn("conv1.3", "conv1.4", x, p, 3, 2, bias=True))
        x = _layer(ops, "layer1", x, "basic", p, spec.m)
        x = relu(_layer(ops, "layer2", relu(x), "basic", p * 2, spec.m, stride=2))

    # Stay-folded region (opt-in, `wfold_region`): when a P/D branch folds
    # (planes < 128, even 1/8-res grid), fold ONCE at its entry and unfold
    # ONCE at its exit — the pag/diff fusions between stages run folded
    # too, their upsampled 1/16 and 1/32 partners entering folded space
    # through resize_wfold (a constant-tap MXU conv) instead of
    # resize+reshape. This removes the per-stage wfold/wunfold relayout
    # copies XLA inserts when the lane dimension changes (batch-1 copy
    # budget: 0.61 ms of the 2.0 ms step, docs/DESIGN.md round 5).
    # `wfold_region` accepts True / "p" / "d" so each branch A/Bs alone.
    from pidnet_tpu.ops.resize import resize_wfold
    from pidnet_tpu.ops.wfold import wfold, wunfold

    region = getattr(ops, "wfold_region", False)
    if region == "auto":
        # Chip A/B at 1024x2048 (device-busy ms/step, docs/DESIGN.md r5):
        # batch 1: 2.00 off / 2.20 on; batch 2: 4.00/4.45; batch 4:
        # 8.30/9.17; batch 8: 15.21/13.66 (+11%). The folded blend
        # tensors only get copy-free layouts once the batch fills the
        # 8-wide sublane axis, so engage at batch >= 8 exactly.
        region = x.shape[0] >= 8
    d3_planes = p if spec.m == 2 else p * 2
    wf_on = (
        bool(region)
        and getattr(ops, "wfold", False)
        and not ALGC  # resize_wfold implements align_corners=False only
        and h8 % 4 == 0  # 1/32 partners must up-sample exactly 4x
        and w8 % 4 == 0
        and w8 // 2 >= 2
    )
    on_p = region is True or (isinstance(region, str) and "p" in region)
    on_d = region is True or (isinstance(region, str) and "d" in region)
    f_p = 2 if wf_on and on_p and p * 2 < 128 else None
    f_d = 2 if wf_on and on_d and d3_planes < 128 else None

    if f_p is not None:  # P @1/8
        x_pf = _wf_stage(ops, "layer3_", wfold(x, f_p), "basic", p * 2, spec.m, f_p)
    else:
        x_ = _wf_layer(ops, "layer3_", x, "basic", p * 2, spec.m)
    if f_d is not None:  # D @1/8
        x_df = _wf_single(ops, "layer3_d", wfold(x, f_d), "basic", d3_planes, f_d)
    else:
        x_d = _wf_single_layer(ops, "layer3_d", x, "basic", d3_planes)

    x = relu(_layer(ops, "layer3", x, "basic", p * 4, spec.n, stride=2))  # I @1/16
    comp3 = ops.convbn("compression3.0", "compression3.1", x, p * 2, 1)
    # The reference saves temp_p = x_ after pag3 (pidnet.py:154) but its
    # inplace ReLU at pidnet.py:157 then mutates that saved tensor, so
    # seghead_p effectively consumes relu(pag3 output). Reproduce that.
    if f_p is not None:
        x_pf = relu(_pagfm_wf(ops, "pag3", x_pf, comp3, p, f_p))
        temp_p_f = x_pf
    else:
        x_ = relu(_pagfm(ops, "pag3", x_, comp3, p))
        temp_p = x_
    dif3 = ops.convbn("diff3.0", "diff3.1", x, d3_planes, 3)
    if f_d is not None:
        x_df = x_df + resize_wfold(dif3, f_d, 2)
    else:
        x_d = x_d + resize_bilinear(dif3, (h8, w8), ALGC)

    x = relu(_layer(ops, "layer4", x, "basic", p * 8, spec.n, stride=2))  # I @1/32
    if f_p is not None:
        x_pf = _wf_stage(ops, "layer4_", x_pf, "basic", p * 2, spec.m, f_p)
    else:
        x_ = _wf_layer(ops, "layer4_", x_, "basic", p * 2, spec.m)
    if spec.m == 2:
        if f_d is not None:
            x_df = _wf_stage(ops, "layer4_d", relu(x_df), "bottleneck", p, 1, f_d)
        else:
            x_d = _wf_layer(ops, "layer4_d", relu(x_d), "bottleneck", p, 1)
    elif f_d is not None:
        x_df = _wf_single(ops, "layer4_d", relu(x_df), "basic", p * 2, f_d)
    else:
        x_d = _wf_single_layer(ops, "layer4_d", relu(x_d), "basic", p * 2)

    comp4 = ops.convbn("compression4.0", "compression4.1", x, p * 2, 1)
    if f_p is not None:
        x_pf = _pagfm_wf(ops, "pag4", x_pf, comp4, p, f_p)
    else:
        x_ = _pagfm(ops, "pag4", x_, comp4, p)
    dif4 = ops.convbn("diff4.0", "diff4.1", x, p * 2, 3)
    # Same inplace-ReLU aliasing as temp_p: the reference's relu at
    # pidnet.py:169 mutates temp_d (saved at :166) before seghead_d runs.
    if f_d is not None:
        x_df = relu(x_df + resize_wfold(dif4, f_d, 4))
        temp_d_f = x_df
    else:
        x_d = relu(x_d + resize_bilinear(dif4, (h8, w8), ALGC))
        temp_d = x_d

    if f_p is not None:
        x_ = wunfold(
            _wf_stage(ops, "layer5_", relu(x_pf), "bottleneck", p * 2, 1, f_p), f_p
        )
    else:
        x_ = _wf_layer(ops, "layer5_", relu(x_), "bottleneck", p * 2, 1)
    if f_d is not None:
        if p * 2 < 128:
            x_d = wunfold(
                _wf_stage(ops, "layer5_d", x_df, "bottleneck", p * 2, 1, f_d), f_d
            )
        else:  # M: 128-ch layer5_d gains nothing folded — unfold first
            x_d = _layer(ops, "layer5_d", wunfold(x_df, f_d), "bottleneck", p * 2, 1)
    else:
        x_d = _wf_layer(ops, "layer5_d", x_d, "bottleneck", p * 2, 1)
    # "pre_spp"/"post_spp": under spatial (H-dim) sharding the caller
    # un-shards H here — the 1/64 PPM maps are tiny (16x32 at 1024x2048),
    # so sharding them is all collective overhead, and the giant-padding
    # avg pools are exactly where GSPMD's halo machinery is least at home.
    x = _layer(ops, "layer5", _hint(ops, "pre_spp", x),
               "bottleneck", p * 8, 2, stride=2)  # I @1/64

    if spec.m == 2:
        spp = _pappm(ops, "spp", x, spec.ppm_planes, p * 4)
    else:
        spp = _dappm(ops, "spp", x, spec.ppm_planes, p * 4)
    x = _hint(ops, "post_spp", resize_bilinear(spp, (h8, w8), ALGC))

    if spec.m == 2:
        fused = _light_bag(ops, "dfm", x_, x, x_d, p * 4)
    else:
        fused = _bag(ops, "dfm", x_, x, x_d, p * 4)
    out = _segmenthead(ops, "final_layer", fused, spec.head_planes, spec.num_classes)

    if spec.augment:
        if f_p is not None:
            temp_p = wunfold(temp_p_f, f_p)  # heads read the normal layout
        if f_d is not None:
            temp_d = wunfold(temp_d_f, f_d)
        x_extra_p = _segmenthead(ops, "seghead_p", temp_p, spec.head_planes, spec.num_classes)
        x_extra_d = _segmenthead(ops, "seghead_d", temp_d, p, 1)
        return [x_extra_p, out, x_extra_d]
    return out


# ---------------------------------------------------------------------------
# Init / apply API
# ---------------------------------------------------------------------------


def _forward_of(spec):
    """The wiring function for this spec — the architecture extension point.

    A spec dataclass may carry its own `forward_fn(ops, x, spec)` (e.g.
    models/ddrnet.DDRNetSpec); everything downstream (init, apply, folding,
    train/eval steps, the engine, the CLIs) dispatches through here and is
    architecture-agnostic. Default: the stock PIDNet wiring."""
    return getattr(spec, "forward_fn", None) or _forward


def trace_spec(spec, input_hw: tuple[int, int] = (64, 128)) -> _TraceOps:
    """Collect the full parameter/state spec via abstract evaluation."""
    ops = _TraceOps()
    fwd = _forward_of(spec)

    def run(x):
        return fwd(ops, x, spec)

    jax.eval_shape(run, jax.ShapeDtypeStruct((1, *input_hw, 3), jnp.float32))
    return ops


def _name_key(key, name: str):
    """Per-parameter PRNG key derived from the parameter's NAME, not its
    trace position. The reference's positional analogue (module-order
    init, reference pidnet.py:95-100) survives only because its module
    list never changes; trace-order key handout meant any wiring refactor
    silently reshuffled every downstream parameter's init (this broke the
    round-4 goldens). crc32 is stable across processes/platforms, unlike
    Python's salted hash()."""
    import zlib

    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)


def init(key, spec) -> tuple[dict, dict]:
    """Random init matching the reference's scheme (pidnet.py:95-100):
    kaiming-normal(fan_out, relu) conv weights, BN gamma=1/beta=0.
    Each conv's subkey is derived from its name (`_name_key`), so init is
    invariant to the order wiring code registers parameters in."""
    traced = trace_spec(spec)
    params: dict[str, jnp.ndarray] = {}
    state: dict[str, jnp.ndarray] = {}
    hashes = {}
    for name in traced.convs:
        import zlib

        h = zlib.crc32(name.encode()) & 0x7FFFFFFF
        assert h not in hashes, f"init key collision: {name} vs {hashes[h]}"
        hashes[h] = name
    for name, (k, cin_g, cout, bias) in traced.convs.items():
        sub = _name_key(key, name)
        fan_out = cout * k * k
        std = math.sqrt(2.0 / fan_out)
        params[name + ".weight"] = (
            jax.random.normal(sub, (k, k, cin_g, cout), jnp.float32) * std
        )
        if bias:
            fan_in = cin_g * k * k
            bound = 1.0 / math.sqrt(fan_in)
            bkey = jax.random.fold_in(sub, 1)
            params[name + ".bias"] = jax.random.uniform(
                bkey, (cout,), jnp.float32, -bound, bound
            )
    for name, ch in traced.bns.items():
        params[name + ".weight"] = jnp.ones((ch,), jnp.float32)
        params[name + ".bias"] = jnp.zeros((ch,), jnp.float32)
        state[name + ".running_mean"] = jnp.zeros((ch,), jnp.float32)
        state[name + ".running_var"] = jnp.ones((ch,), jnp.float32)
    return params, state


def apply(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    spec,
    *,
    train: bool = False,
    sync_bn_axis: str | None = None,
    compute_dtype=None,
    folded: bool = False,
    stem_s2d: bool = False,
    wfold: bool = False,
    wfold_region=False,
    shard_hint=None,
    sample_weight=None,
):
    """Run the network on NHWC input.

    Returns `(outputs, new_state)` in train mode, else `outputs`.
    `folded=True` expects parameters produced by `convert.fold.fold_params`
    (inference-only; replaces each conv+BN with a biased conv — the
    automated equivalent of the reference's hand-edited BN-free speed
    models, models/speed/pidnet_speed.py:37-40). `stem_s2d=True` runs the
    network front (stem+layer1+layer2) in space-to-depth layout — identical
    math, much better MXU occupancy. With folded params the s2d kernels are
    prebuilt; otherwise they are derived live from the canonical weights
    (differentiable, checkpoint-compatible, grouped-BN statistics).
    `sample_weight` (N,) in {0,1} excludes padding samples from training
    BatchNorm statistics (train/step.py pad_batch). `wfold=True` runs the
    narrow-channel P/D branch stages in W-folded layout (ops/wfold.py) —
    identical math, full MXU lanes.
    """
    ops = _ApplyOps(
        params,
        state,
        train=train,
        sync_axis=sync_bn_axis,
        compute_dtype=compute_dtype,
        folded=folded,
        stem_s2d=stem_s2d,
        wfold=wfold,
        wfold_region=wfold_region,
        shard_hint=shard_hint,
        sample_weight=sample_weight,
    )
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    out = _forward_of(spec)(ops, x, spec)
    if train:
        new_state = dict(state)
        new_state.update(ops.new_state)
        return out, new_state
    return out


def make_inference_fn(spec: PIDNetSpec, *, folded: bool = False, compute_dtype=None):
    """A jit-ready `(params, state, x) -> outputs` closure."""

    @partial(jax.jit, static_argnums=())
    def fn(params, state, x):
        return apply(
            params, state, x, spec, train=False, folded=folded, compute_dtype=compute_dtype
        )

    return fn


def num_params(params: dict) -> int:
    return int(sum(np.prod(v.shape) for v in params.values()))
