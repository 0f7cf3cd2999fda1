"""Host-side augmentation pipeline (numpy + cv2).

Reproduces the reference training pipeline (datasets/base_dataset.py:36-133)
with explicit RNG state instead of global `random`/`np.random`:

- boundary ground truth: Canny(label) -> zero a 6-px frame (Cityscapes
  only) -> dilate with a (edge_size x edge_size) ones kernel -> binarize
  (>50) (base_dataset.py:109-114);
- multi-scale: rand_scale = 0.5 + randint(0, scale_factor)/10, long side
  scaled, image INTER_LINEAR / label+edge INTER_NEAREST (:78-103,117);
- pad to crop size (label pad = ignore_label, edge pad 0) then uniform
  random crop (:49-76);
- normalize: optional BGR->RGB reversal, /255, ImageNet mean/std (:36-44);
- random horizontal flip of image/label/edge together (:127-131).

Outputs stay NHWC (TPU layout) — no CHW transpose.
"""

from __future__ import annotations

import cv2
import numpy as np

Y_K_SIZE = 6
X_K_SIZE = 6
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def input_transform(image: np.ndarray, *, bgr_to_rgb: bool) -> np.ndarray:
    if image.dtype == np.uint8:
        # single-pass native kernel (numpy fallback inside when the .so
        # isn't built) — the host has one core, every pass counts
        from pidnet_tpu.data import native

        return native.normalize_u8_f32(
            image, IMAGENET_MEAN, IMAGENET_STD, bgr_to_rgb=bgr_to_rgb
        )
    image = image.astype(np.float32)
    if bgr_to_rgb:
        image = image[:, :, ::-1]
    image = image / 255.0
    image -= IMAGENET_MEAN
    image /= IMAGENET_STD
    return image


def gen_edge_gt(label: np.ndarray, *, edge_size: int = 4, edge_pad: bool = True) -> np.ndarray:
    """Boundary supervision map from the label image.

    Returned as uint8 {0,1}: the mask is binary, so carrying it through
    the NEAREST multi-scale resize as u8 instead of f32 moves 4x fewer
    bytes (the resize at large rand_scales is a host hot spot) with
    bit-identical values; `gen_sample` converts to f32 at the very end.
    Deterministic in `label` — cacheable per image (SegDataset cache).
    """
    edge = cv2.Canny(label, 0.1, 0.2)
    kernel = np.ones((edge_size, edge_size), np.uint8)
    if edge_pad:
        edge = edge[Y_K_SIZE:-Y_K_SIZE, X_K_SIZE:-X_K_SIZE]
        edge = np.pad(edge, ((Y_K_SIZE, Y_K_SIZE), (X_K_SIZE, X_K_SIZE)), mode="constant")
    return (cv2.dilate(edge, kernel, iterations=1) > 50).astype(np.uint8)


def pad_image(image: np.ndarray, size: tuple[int, int], padvalue) -> np.ndarray:
    h, w = image.shape[:2]
    pad_h = max(size[0] - h, 0)
    pad_w = max(size[1] - w, 0)
    if pad_h > 0 or pad_w > 0:
        image = cv2.copyMakeBorder(
            image, 0, pad_h, 0, pad_w, cv2.BORDER_CONSTANT, value=padvalue
        )
    return image


def rand_crop(rng: np.random.Generator, image, label, edge, crop_size, ignore_label):
    image = pad_image(image, crop_size, (0.0, 0.0, 0.0))
    label = pad_image(label, crop_size, (ignore_label,))
    edge = pad_image(edge, crop_size, (0.0,))
    new_h, new_w = label.shape
    x = int(rng.integers(0, new_w - crop_size[1] + 1))
    y = int(rng.integers(0, new_h - crop_size[0] + 1))
    image = image[y : y + crop_size[0], x : x + crop_size[1]]
    label = label[y : y + crop_size[0], x : x + crop_size[1]]
    edge = edge[y : y + crop_size[0], x : x + crop_size[1]]
    return image, label, edge


def multi_scale_aug(
    rng: np.random.Generator,
    image,
    label,
    edge,
    *,
    base_size: int,
    rand_scale: float,
    crop_size,
    ignore_label,
    do_crop: bool = True,
):
    long_size = int(base_size * rand_scale + 0.5)
    h, w = image.shape[:2]
    if h > w:
        new_h, new_w = long_size, int(w * long_size / h + 0.5)
    else:
        new_w, new_h = long_size, int(h * long_size / w + 0.5)
    image = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    label = cv2.resize(label, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
    edge = cv2.resize(edge, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
    if do_crop:
        image, label, edge = rand_crop(rng, image, label, edge, crop_size, ignore_label)
    return image, label, edge


def gen_sample(
    rng: np.random.Generator,
    image: np.ndarray,
    label: np.ndarray,
    *,
    multi_scale: bool,
    is_flip: bool,
    base_size: int,
    crop_size,
    scale_factor: int,
    ignore_label: int,
    edge_pad: bool = True,
    edge_size: int = 4,
    bgr_to_rgb: bool = True,
    edge: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full train-time pipeline -> (image HWC f32, label HW u8, edge HW f32).

    `edge` short-circuits the Canny+dilate stage with a precomputed
    full-resolution u8 edge map (SegDataset's decoded-sample cache — the
    edge GT is deterministic in the label)."""
    if edge is None:
        edge = gen_edge_gt(label, edge_size=edge_size, edge_pad=edge_pad)

    if multi_scale:
        rand_scale = 0.5 + int(rng.integers(0, scale_factor + 1)) / 10.0
        image, label, edge = multi_scale_aug(
            rng,
            image,
            label,
            edge,
            base_size=base_size,
            rand_scale=rand_scale,
            crop_size=crop_size,
            ignore_label=ignore_label,
        )

    image = input_transform(image, bgr_to_rgb=bgr_to_rgb)
    label = np.array(label).astype(np.uint8)

    if is_flip and int(rng.integers(0, 2)) == 0:  # same draw as `*2-1 == -1`
        from pidnet_tpu.data import native

        image = native.hflip_f32(image)
        label = label[:, ::-1]
        edge = edge[:, ::-1]

    return (
        np.ascontiguousarray(image),
        np.ascontiguousarray(label),
        np.ascontiguousarray(edge, dtype=np.float32),
    )
