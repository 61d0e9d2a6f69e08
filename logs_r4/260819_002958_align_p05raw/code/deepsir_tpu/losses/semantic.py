"""Semantic segmentation loss + mIoU metric accumulation.

TPU-native equivalent of the reference's SemanticLoss
(/root/reference/network/loss.py:854-1000): inverse-frequency-weighted cross
entropy over valid (non-'unlabeled') points, plus a confusion-matrix-based
mIoU. The reference drops ignored points with boolean indexing (dynamic
shapes) and accumulates sklearn confusion matrices on CPU; here the ignore
mask stays static-shaped (weights zeroed) and the confusion matrix is an
in-graph scatter-add, accumulated across batches by a tiny host-side helper.

Label convention: raw labels are SemanticKITTI learning-map ids 0..19 where
0 = 'unlabeled' (ignored); logits have 19 classes for ids 1..19.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 19

# points per class in SemanticKITTI, for inverse-frequency CE weights
# (reference SemanticLoss.get_class_weights, loss.py:895-911)
_NUM_PER_CLASS = np.array([
    55437630, 320797, 541736, 2578735, 3274484, 552662, 184064, 78858,
    240942562, 17294618, 170599734, 6369672, 230413074, 101130274, 476491114,
    9833174, 129609852, 4506626, 1168181], dtype=np.float64)
_freq = _NUM_PER_CLASS / _NUM_PER_CLASS.sum()
# numpy (not jnp): a module-level device array would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering
CLASS_WEIGHTS = np.asarray(1.0 / (_freq + 0.02), dtype=np.float32)

LABEL_NAMES = (
    "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
    "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign")


def semantic_loss(logits: jnp.ndarray, labels: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted CE over valid points + accuracy.

    logits: (..., N, 19); labels: (..., N) raw ids in 0..19 (0 ignored).
    Returns (scalar loss, scalar accuracy).
    """
    valid = labels > 0
    target = jnp.clip(labels - 1, 0, NUM_CLASSES - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    w = jnp.asarray(CLASS_WEIGHTS)[target] * valid
    loss = jnp.sum(nll * w) / (jnp.sum(w) + 1e-12)

    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == target) & valid
    acc = jnp.sum(correct) / (jnp.sum(valid) + 1e-12)
    return loss, acc


def confusion_matrix(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(19, 19) confusion counts over valid points: rows = GT, cols = pred."""
    valid = labels > 0
    target = jnp.clip(labels - 1, 0, NUM_CLASSES - 1)
    pred = jnp.argmax(logits, axis=-1)
    flat = (target * NUM_CLASSES + pred).reshape(-1)
    contrib = valid.reshape(-1).astype(jnp.int32)
    cm = jnp.zeros((NUM_CLASSES * NUM_CLASSES,), jnp.int32).at[flat].add(contrib)
    return cm.reshape(NUM_CLASSES, NUM_CLASSES)


class SemanticMetric:
    """Host-side accumulator for mIoU/accuracy across batches
    (replaces the reference's stateful confusion accumulation,
    loss.py:888-989)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.cm = np.zeros((NUM_CLASSES, NUM_CLASSES), dtype=np.int64)

    def update(self, cm_batch) -> None:
        self.cm += np.asarray(cm_batch, dtype=np.int64)

    def compute(self):
        """Returns (mean_iou, per-class iou list, mean accuracy); resets."""
        gt = self.cm.sum(axis=1)
        pos = self.cm.sum(axis=0)
        tp = np.diagonal(self.cm)
        denom = gt + pos - tp
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
        mean_iou = float(iou.sum() / NUM_CLASSES)
        total = self.cm.sum()
        mean_acc = float(tp.sum() / total) if total > 0 else 0.0
        self.reset()
        return mean_iou, iou.tolist(), mean_acc
