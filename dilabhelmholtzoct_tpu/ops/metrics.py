"""Segmentation metrics owned natively (no sklearn / HF-evaluate dependency).

Replaces the reference's imported metric stack (octsam/models/
training_utils.py:89,136-156): HF ``evaluate.load("mean_iou")`` per-category
IoU/accuracy, and sklearn F1 / average-precision / confusion-matrix-derived
sensitivity, specificity, Dice. Semantics verified against sklearn in
tests/test_metrics.py.

All confusion-based metrics reduce to (tn, fp, fn, tp); heavy reductions are
vectorized numpy (the eval harness runs them on host over full test splits)
with a jnp fast path for on-device batched confusion counts.
"""

from __future__ import annotations

import numpy as np


def binary_confusion(pred, gt):
    """pred/gt: binary arrays (any shape) → (tn, fp, fn, tp) as ints."""
    pred = np.asarray(pred).astype(bool).reshape(-1)
    gt = np.asarray(gt).astype(bool).reshape(-1)
    tp = int(np.sum(pred & gt))
    fp = int(np.sum(pred & ~gt))
    fn = int(np.sum(~pred & gt))
    tn = pred.size - tp - fp - fn
    return tn, fp, fn, tp


def iou(tn, fp, fn, tp):
    """Per-category IoU of the foreground label — HF mean_iou's
    per_category_iou[1]."""
    d = tp + fp + fn
    return tp / d if d else float("nan")


def category_accuracy(tn, fp, fn, tp):
    """HF mean_iou per_category_accuracy[1] = intersect / total_label."""
    d = tp + fn
    return tp / d if d else float("nan")


def f1(tn, fp, fn, tp):
    d = 2 * tp + fp + fn
    return 2 * tp / d if d else 0.0


dice = f1  # Dice coefficient == F1 for binary masks (training_utils.py:156)


def sensitivity(tn, fp, fn, tp):
    return tp / (tp + fn) if (tp + fn) else 0.0


def specificity(tn, fp, fn, tp):
    return tn / (tn + fp) if (tn + fp) else 0.0


def average_precision(scores, labels):
    """sklearn ``average_precision_score`` for binary labels.

    AP = sum_k (R_k - R_{k-1}) * P_k over descending unique score thresholds.
    """
    # sort in the input precision (f32 upstream): ties and order are
    # identical to an f64 sort of the same values, and the argsort is the
    # dominant cost on full-split pixel counts
    scores = np.ascontiguousarray(np.reshape(scores, -1))
    labels = np.asarray(labels).astype(bool).reshape(-1)
    n_pos = int(labels.sum())
    if n_pos == 0:
        return 0.0
    # stability is irrelevant to AP: cumulative tps are only read at the
    # END of each tie group, so any order within ties gives the same value
    # (quicksort is ~2x faster than sklearn's mergesort on these sizes)
    order = np.argsort(-scores)
    scores = scores[order]
    labels = labels[order]
    # indices of last occurrence of each distinct score
    distinct = np.where(np.diff(scores))[0]
    thresh_idx = np.concatenate([distinct, [scores.size - 1]])
    tps = np.cumsum(labels)[thresh_idx].astype(np.float64)
    fps = (thresh_idx + 1) - tps
    precision = tps / (tps + fps)
    recall = tps / n_pos
    prev_recall = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - prev_recall) * precision))


def binary_report(pred, gt, scores=None):
    """All reference per-class metrics in one pass.

    Returns dict with keys iou, accuracy, f1, dice, sensitivity,
    specificity, and (if scores given) ap.
    """
    c = binary_confusion(pred, gt)
    out = {
        "iou": iou(*c),
        "accuracy": category_accuracy(*c),
        "f1": f1(*c),
        "dice": dice(*c),
        "sensitivity": sensitivity(*c),
        "specificity": specificity(*c),
    }
    if scores is not None:
        out["ap"] = average_precision(scores, gt)
    return out


def batched_confusion_jnp(pred, gt):
    """On-device confusion counts; pred/gt: (B, ...) binary → (B, 4) i32."""
    import jax.numpy as jnp

    p = pred.reshape(pred.shape[0], -1).astype(jnp.bool_)
    g = gt.reshape(gt.shape[0], -1).astype(jnp.bool_)
    tp = jnp.sum(p & g, axis=1)
    fp = jnp.sum(p & ~g, axis=1)
    fn = jnp.sum(~p & g, axis=1)
    tn = p.shape[1] - tp - fp - fn
    return jnp.stack([tn, fp, fn, tp], axis=1).astype(jnp.int32)
