"""Segmentation metrics, on-device.

The reference computes confusion matrices on the host in numpy per batch
(utils/utils.py:129-152 — an eval-throughput hotspot per SURVEY §2.6).
Here the C x C matrix is a single device-side bincount (segment-sum) over
`gt * C + pred`; only the tiny matrix crosses to the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def confusion_matrix(logits, labels, num_classes: int, ignore_label: int = 255):
    """logits (N,H,W,C) or preds (N,H,W) int; labels (N,H,W) int -> (C,C)."""
    if logits.ndim == labels.ndim + 1:
        preds = jnp.argmax(logits, axis=-1)
    else:
        preds = logits
    labels = labels.astype(jnp.int32)
    preds = preds.astype(jnp.int32)
    valid = labels != ignore_label
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    counts = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    # float32 keeps TPU-native dtypes; exact for counts < 2^24 per cell,
    # ample for per-batch matrices (host accumulation uses float64).
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.float32)


def iou_from_cm(cm: np.ndarray):
    """(IoU per class, mean IoU) — reference utils/function.py:114-121."""
    cm = np.asarray(cm, np.float64)
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    iou = tp / np.maximum(1.0, pos + res - tp)
    return iou, float(iou.mean())


def acc_from_cm(cm: np.ndarray):
    """(pixel acc, mean per-class acc) — reference utils/function.py:169-177."""
    cm = np.asarray(cm, np.float64)
    pos = cm.sum(1)
    tp = np.diag(cm)
    pixel_acc = float(tp.sum() / max(pos.sum(), 1.0))
    mean_acc = float((tp / np.maximum(1.0, pos)).mean())
    return pixel_acc, mean_acc
