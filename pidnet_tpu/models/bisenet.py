"""BiSeNetV1 + ADB + Light_Bag — the reference's second paper ablation
(reference models/others/bisenet_adb_bag.py:229-437 + the ResNet-18
feature extractor, models/others/resnet.py:54-96), wired from the block
library through the spec `forward_fn` extension point like
models/ddrnet.py.

BiSeNetV1 (context path = ResNet-18 + attention refinement; spatial path
= 3 stride-2 convs) retrofitted with PIDNet's auxiliary derivative branch
(ADB: convD1-3 + diff3/diff4 adds on the context features, reference
:229-280) and Light_Bag fusion of (spatial, context, derivative)
(reference :379). All interior upsampling is align_corners=False and the
output heads upsample to INPUT resolution inside the model (reference
:147-148 — unlike PIDNet, which emits 1/8-res logits).

aux mode returns ``[out16, out32, out, outd]`` (reference :396-400):
three seg heads with the FINAL head last-but-one and the 1-channel
boundary head last — the same [aux..., final, boundary] convention
FullLoss consumes, so the ablation trains through the generic step with
``balance_weights`` of length 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pidnet_tpu.models.pidnet import (
    _basic_block,
    _light_bag,
    _single_layer,
)
from pidnet_tpu.nn.functional import global_avg_pool, max_pool2d, relu, sigmoid
from pidnet_tpu.ops.resize import resize_bilinear


def _cbr(ops, prefix, x, cout, k, stride=1):
    """ConvBNReLU (reference bisenet_adb_bag.py:97-117): names .conv/.bn."""
    return relu(ops.convbn(f"{prefix}.conv", f"{prefix}.bn", x, cout, k, stride))


def _resnet18(ops, prefix, x):
    """ResNet-18 trunk returning (feat8, feat16, feat32)
    (reference models/others/resnet.py:54-80). Its BasicBlocks always end
    in ReLU (no no_relu variant, resnet.py:31-44)."""
    x = relu(ops.convbn(f"{prefix}.conv1", f"{prefix}.bn1", x, 64, 7, 2))
    x = max_pool2d(x, 3, 2, 1)
    for name, planes, stride in (
        ("layer1", 64, 1), ("layer2", 128, 2), ("layer3", 256, 2), ("layer4", 512, 2)
    ):
        for i in range(2):
            x = _basic_block(
                ops, f"{prefix}.{name}.{i}", x, planes,
                stride if i == 0 else 1, no_relu=False,
            )
        if name == "layer2":
            feat8 = x
        elif name == "layer3":
            feat16 = x
    return feat8, feat16, x


def _arm(ops, prefix, x, cout):
    """AttentionRefinementModule (reference :174-193): global context gates
    the refined features."""
    feat = _cbr(ops, f"{prefix}.conv", x, cout, 3)
    atten = global_avg_pool(feat)
    atten = ops.bn(f"{prefix}.bn_atten", ops.conv(f"{prefix}.conv_atten", atten, cout, 1))
    return feat * sigmoid(atten)


def _context_path(ops, x):
    """ContextPath with the grafted ADB branch (reference :202-280).
    Returns (feat_cp8 @1/8, feat_cp16 @1/16, feat_d_out, feat_d)."""
    feat8, feat16, feat32 = _resnet18(ops, "cp.resnet", x)
    h8, w8 = feat8.shape[1], feat8.shape[2]

    avg = _cbr(ops, "cp.conv_avg", global_avg_pool(feat32), 128, 1)
    feat32_sum = _arm(ops, "cp.arm32", feat32, 128) + avg
    feat32_up = resize_bilinear(
        feat32_sum, (feat32.shape[1] * 2, feat32.shape[2] * 2), False
    )
    feat32_up = _cbr(ops, "cp.conv_head32", feat32_up, 128, 3)

    feat16_sum = _arm(ops, "cp.arm16", feat16, 128) + feat32_up
    feat16_up = resize_bilinear(
        feat16_sum, (feat16.shape[1] * 2, feat16.shape[2] * 2), False
    )
    feat16_up = _cbr(ops, "cp.conv_head16", feat16_up, 128, 3)

    # ADB: derivative branch over the context features (reference :229-262)
    feat_d = _single_layer(ops, "cp.convD1", feat8, "basic", 64)
    feat_d = feat_d + resize_bilinear(
        ops.convbn("cp.diff3.0", "cp.diff3.1", feat16, 64, 3), (h8, w8), False
    )
    feat_d = _single_layer(ops, "cp.convD2", relu(feat_d), "basic", 64)
    feat_d = feat_d + resize_bilinear(
        ops.convbn("cp.diff4.0", "cp.diff4.1", feat32, 64, 3), (h8, w8), False
    )
    # ContextPath's relu is inplace (reference :262), so the `feat_d` the
    # forward RETURNS (and conv_outd consumes, :399) is the relu'd tensor —
    # the same aliasing quirk as PIDNet's temp_p/temp_d
    feat_d = relu(feat_d)
    feat_d_out = _single_layer(ops, "cp.convD3", feat_d, "bottleneck", 64)
    return feat16_up, feat32_up, feat_d_out, feat_d


def _spatial_path(ops, x):
    """SpatialPath: /8 high-detail features (reference :296-310)."""
    x = _cbr(ops, "sp.conv1", x, 64, 7, 2)
    x = _cbr(ops, "sp.conv2", x, 64, 3, 2)
    x = _cbr(ops, "sp.conv3", x, 64, 3, 2)
    return _cbr(ops, "sp.conv_out", x, 128, 1)


def _ffm(ops, x, cout):
    """FeatureFusionModule (reference :330-353): self-gated residual."""
    feat = _cbr(ops, "ffm.convblk", x, cout, 1)
    atten = ops.bn("ffm.bn", ops.conv("ffm.conv", global_avg_pool(feat), cout, 1))
    return feat * sigmoid(atten) + feat


def _head(ops, prefix, x, mid, n_out, up_factor):
    """BiSeNetOutput (reference :139-161): CBR -> 1x1 -> xup_factor."""
    y = _cbr(ops, f"{prefix}.conv", x, mid, 3)
    y = ops.conv(f"{prefix}.conv_out", y, n_out, 1, bias=True)
    return resize_bilinear(
        y, (y.shape[1] * up_factor, y.shape[2] * up_factor), False
    )


def _forward(ops, x, spec: "BiSeNetSpec"):
    """Reference models/others/bisenet_adb_bag.py:388-403, NHWC."""
    feat_cp8, feat_cp16, feat_d_out, feat_d = _context_path(ops, x)
    feat_sp = _spatial_path(ops, x)
    feat_bg = _light_bag(ops, "dfm", feat_sp, feat_cp8, feat_d_out, 256)
    feat_fuse = _ffm(ops, feat_bg, 256)
    out = _head(ops, "conv_out", feat_fuse, 256, spec.num_classes, 8)
    if spec.augment:
        out16 = _head(ops, "conv_out16", feat_cp8, 64, spec.num_classes, 8)
        out32 = _head(ops, "conv_out32", feat_cp16, 64, spec.num_classes, 16)
        outd = _head(ops, "conv_outd", feat_d, 64, 1, 8)
        return [out16, out32, out, outd]
    return out


@dataclass(frozen=True)
class BiSeNetSpec:
    num_classes: int = 19
    augment: bool = True  # the reference's aux_mode (:375)
    forward_fn: object = field(default=_forward, repr=False, compare=False)


def spec_for(name: str, num_classes: int, augment: bool) -> BiSeNetSpec:
    assert "bisenet" in name
    return BiSeNetSpec(num_classes=num_classes, augment=augment)
