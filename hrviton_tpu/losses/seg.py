"""Segmentation losses & metrics.

  * cross_entropy2d with ignore_index=250 (/root/reference/utils.py:29-42)
  * iou_metric over thresholded softmax (/root/reference/train_condition.py:18-36)
  * cal_miou over argmax one-hot, classes 1..8 (/root/reference/utils.py:80-91)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hrviton_tpu.ops.resize import interpolate

__all__ = ["cross_entropy2d", "iou_metric", "cal_miou"]


def cross_entropy2d(logits, target, ignore_index: int = 250):
    """NHWC logits (N,H,W,C), int target (N,Ht,Wt); mean CE over non-ignored.

    Size mismatch handling matches utils.py:34-35 (bilinear, align_corners=True).
    """
    n, h, w, c = logits.shape
    th, tw = target.shape[1:3]
    if (h, w) != (th, tw):
        logits = interpolate(logits, size=(th, tw), mode="bilinear",
                             align_corners=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = (target != ignore_index)
    tsafe = jnp.where(valid, target, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, tsafe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def iou_metric(y_pred, y_true, eps: float = 1e-7):
    """Mean-over-batch IoU of (pred > 0.5) vs binary targets, all channels
    (train_condition.py:18-36 semantics, fully vectorized)."""
    pred = (y_pred > 0.5).astype(jnp.float32)
    true = y_true.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * true, axis=axes)
    union = jnp.sum(pred, axis=axes) + jnp.sum(true, axis=axes)
    return jnp.mean((inter + eps) / (union - inter + eps))


def cal_miou(prediction, target, classes=tuple(range(1, 9))):
    """Aggregate IoU over classes 1..8 of argmax-one-hot predictions
    (utils.py:80-91): single intersection/union ratio over batch+classes."""
    pred_label = jnp.argmax(prediction, axis=-1)
    onehot = (pred_label[..., None] == jnp.arange(prediction.shape[-1]))
    cls = jnp.asarray(classes)
    p = onehot[..., cls]
    t = target[..., cls] > 0.5
    inter = jnp.sum(jnp.logical_and(p, t))
    union = jnp.sum(jnp.logical_or(p, t))
    return inter / jnp.maximum(union, 1)
