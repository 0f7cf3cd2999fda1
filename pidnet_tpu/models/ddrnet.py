"""DDRNet-23 + ADB + Bag — the reference's paper-ablation architecture
(reference models/others/ddrnet_23_adb_bag.py:209-392), wired entirely
from the existing block library behind the spec extension point
(models.pidnet._forward_of): DDRNetSpec carries its own `forward_fn`, so
`pidnet.init/apply`, BN folding, the train/eval steps, and the engine all
work unchanged.

Two-branch DDRNet trunk with PIDNet's auxiliary derivative (boundary)
branch grafted on. Structural differences from stock PIDNet:

- **bidirectional P<->I fusion** (the feature PIDNet dropped): I receives
  the downsampled P branch back (`x + down3(relu(x_))`,
  `x + down4(relu(x_))`, reference :347,364) while P receives plain
  compression adds — no PagFM attention;
- compression3/diff3 consume layer3's PRE-fusion output (the reference
  snapshots `layers[2]` before the down3 add, :343-355), ditto layer4;
- `self.relu` is non-inplace here (reference :226), so the aux heads see
  the PRE-activation `temp_p`/`temp_d` — none of PIDNet's inplace-ReLU
  aliasing (contrast models/pidnet.py:153-157);
- the reference constructor is BROKEN as-is: `model_utils.DFM3` (:283)
  does not exist, so building it raises AttributeError (SURVEY §2.3).
  Consistent with the file's `_adb_bag` name, the fusion is repaired as
  `Bag` (reference model_utils.py:363-377), whose (in, out) signature
  matches the `DFM3(planes*4, planes*4)` call site.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pidnet_tpu.models.pidnet import (
    _bag,
    _dappm,
    _layer,
    _segmenthead,
    _single_layer,
    ALGC,
)
from pidnet_tpu.nn.functional import relu
from pidnet_tpu.ops.resize import resize_bilinear


def _forward(ops, x, spec: "DDRNetSpec"):
    """Reference models/others/ddrnet_23_adb_bag.py:328-392, NHWC."""
    p = spec.planes
    hr = p * 2  # highres_planes (reference :214)
    h8, w8 = x.shape[1] // 8, x.shape[2] // 8

    # stem /4 (two biased convs like PIDNet's, reference :217-224)
    x = relu(ops.convbn("conv1.0", "conv1.1", x, p, 3, 2, bias=True))
    x = relu(ops.convbn("conv1.3", "conv1.4", x, p, 3, 2, bias=True))

    x = _layer(ops, "layer1", x, "basic", p, spec.m)
    x = _layer(ops, "layer2", relu(x), "basic", p * 2, spec.m, stride=2)
    l2 = x  # layers[1] (reference :340)

    x = _layer(ops, "layer3", relu(x), "basic", p * 4, spec.m, stride=2)
    l3 = x  # layers[2]: PRE-fusion snapshot (reference :343)
    x_ = _layer(ops, "layer3_", relu(l2), "basic", hr, 2)
    x_d = _single_layer(ops, "layer3_d", relu(l2), "basic", hr)

    # bidirectional fusion, stage 3 (reference :347-355)
    x = x + ops.convbn("down3.0", "down3.1", relu(x_), p * 4, 3, 2)
    x_ = x_ + resize_bilinear(
        ops.convbn("compression3.0", "compression3.1", relu(l3), hr, 1),
        (h8, w8), ALGC,
    )
    x_d = x_d + resize_bilinear(
        ops.convbn("diff3.0", "diff3.1", relu(l3), hr, 3), (h8, w8), ALGC
    )
    temp_p = x_  # pre-activation (non-inplace relu, reference :226,356-357)

    x = _layer(ops, "layer4", relu(x), "basic", p * 8, spec.m, stride=2)
    l4 = x  # layers[3]
    x_ = _layer(ops, "layer4_", relu(x_), "basic", hr, 2)
    x_d = _single_layer(ops, "layer4_d", relu(x_d), "basic", hr)

    # bidirectional fusion, stage 4 (reference :364-372); down4 is a
    # two-step /4 descent: conv-BN-ReLU-conv-BN (reference :242-247)
    down = relu(ops.convbn("down4.0", "down4.1", relu(x_), p * 4, 3, 2))
    x = x + ops.convbn("down4.3", "down4.4", down, p * 8, 3, 2)
    x_ = x_ + resize_bilinear(
        ops.convbn("compression4.0", "compression4.1", relu(l4), hr, 1),
        (h8, w8), ALGC,
    )
    x_d = x_d + resize_bilinear(
        ops.convbn("diff4.0", "diff4.1", relu(l4), hr, 3), (h8, w8), ALGC
    )
    temp_d = x_d

    x_ = _layer(ops, "layer5_", relu(x_), "bottleneck", hr, 1)
    x_d = _layer(ops, "layer5_d", relu(x_d), "bottleneck", hr, 1)
    x = _layer(ops, "layer5", relu(x), "bottleneck", p * 8, 1, stride=2)
    x = resize_bilinear(_dappm(ops, "spp", x, spec.spp_planes, p * 4), (h8, w8), ALGC)

    out = _segmenthead(
        ops, "final_layer", _bag(ops, "dfm", x_, x, x_d, p * 4),
        spec.head_planes, spec.num_classes,
    )

    if spec.augment:
        x_extra = _segmenthead(ops, "seghead_extra", temp_p, spec.head_planes, spec.num_classes)
        x_bd = _segmenthead(ops, "seghead_bd", temp_d, hr // 2, 1)
        return [x_extra, out, x_bd]
    return out


@dataclass(frozen=True)
class DDRNetSpec:
    num_classes: int = 19
    planes: int = 64
    spp_planes: int = 128
    head_planes: int = 128
    m: int = 2  # trunk blocks per stage (DDRNet-23: layers=[2,2,2,2])
    augment: bool = True
    forward_fn: object = field(default=_forward, repr=False, compare=False)


def spec_for(name: str, num_classes: int, augment: bool) -> DDRNetSpec:
    """DualResNet_imagenet config (reference :393)."""
    assert "ddrnet" in name
    return DDRNetSpec(num_classes=num_classes, augment=augment)
