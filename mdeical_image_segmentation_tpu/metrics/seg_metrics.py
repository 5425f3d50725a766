"""Instance-segmentation metrics (DSB2018-style).

Behavioral parity target: /root/reference/model/unet3d/seg_metrics.py —
IoU matrix from a relabeled contingency table (seg_metrics.py:26-46),
tp/fp/fn → precision/recall/accuracy/f1 at an IoU threshold (:49-89), DSB
``Accuracy`` (:92-105) and ``AveragePrecision`` over IoU 0.50:0.05:0.95
(:108-123).  Host-side numpy; operates on final integer label volumes.

Implementation is vectorized over thresholds: the pairwise-IoU table is
built once and each threshold's detection counts come from boolean
reductions over it, so ``AveragePrecision`` costs one contingency pass
instead of ten.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .seg_compat import contingency_table


def _compact_labels(vol: np.ndarray) -> np.ndarray:
    """Map the label values onto 0..K-1 (order-preserving, background first)."""
    _, dense = np.unique(vol, return_inverse=True)
    return dense.reshape(vol.shape)


def _pairwise_iou(gt: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """(K_gt, K_seg) IoU table between every gt/pred instance pair."""
    overlap = contingency_table(_compact_labels(gt), _compact_labels(seg))
    gt_sizes = overlap.sum(axis=1, keepdims=True)
    seg_sizes = overlap.sum(axis=0, keepdims=True)
    iou = overlap / (gt_sizes + seg_sizes - overlap)
    if not (0.0 <= iou.min() and iou.max() <= 1.0):
        raise AssertionError("IoU table out of [0, 1] — corrupt label input")
    return iou


def _detection_counts(iou_fg: np.ndarray, iou_threshold: float):
    """(tp, fp, fn) at one threshold from the foreground-only IoU table.

    A gt instance counts as detected if any prediction overlaps it above
    the threshold; an undetected prediction is a false positive.  Degenerate
    tables (no instances on either side, or no hit anywhere) count as all
    zeros, matching the reference's trivial-case short-circuit.
    """
    hits = iou_fg > iou_threshold
    if hits.size == 0 or not hits.any():
        return 0, 0, 0
    tp = int(hits.any(axis=1).sum())
    fn = iou_fg.shape[0] - tp
    fp = iou_fg.shape[1] - int(hits.any(axis=0).sum())
    return tp, fp, fn


def _rates(tp: int, fp: int, fn: int) -> Dict[str, float]:
    if tp == 0:
        return {"precision": 0, "recall": 0, "accuracy": 0, "f1": 0}
    return {
        "precision": tp / (tp + fp),
        "recall": tp / (tp + fn),
        "accuracy": tp / (tp + fp + fn),
        "f1": (2 * tp) / (2 * tp + fp + fn),
    }


def precision(tp, fp, fn):
    return tp / (tp + fp) if tp > 0 else 0


def recall(tp, fp, fn):
    return tp / (tp + fn) if tp > 0 else 0


def accuracy(tp, fp, fn):
    return tp / (tp + fp + fn) if tp > 0 else 0


def f1(tp, fp, fn):
    return (2 * tp) / (2 * tp + fp + fn) if tp > 0 else 0


class SegmentationMetrics:
    """precision/recall/accuracy/f1 between gt and predicted instances at a
    given IoU threshold; the pairwise-IoU table is built eagerly once."""

    def __init__(self, gt, seg):
        self.iou_matrix = _pairwise_iou(gt, seg)

    def metrics(self, iou_threshold) -> Dict[str, float]:
        # drop background (label-0 row/column) before matching
        tp, fp, fn = _detection_counts(self.iou_matrix[1:, 1:], iou_threshold)
        return _rates(tp, fp, fn)


class Accuracy:
    """DSB-style accuracy TP/(TP+FP+FN) at one IoU threshold."""

    def __init__(self, iou_threshold):
        self.iou_threshold = iou_threshold

    def __call__(self, input_seg, gt_seg):
        return SegmentationMetrics(gt_seg, input_seg).metrics(self.iou_threshold)[
            "accuracy"
        ]


class AveragePrecision:
    """Mean DSB accuracy over IoU thresholds 0.50:0.05:0.95."""

    def __init__(self):
        self.iou_range = np.linspace(0.50, 0.95, 10)

    def __call__(self, input_seg, gt_seg):
        sm = SegmentationMetrics(gt_seg, input_seg)
        return np.mean([sm.metrics(t)["accuracy"] for t in self.iou_range])
