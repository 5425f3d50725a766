"""Instance-segmentation metrics (DSB2018-style).

Reference: /root/reference/model/unet3d/seg_metrics.py — IoU matrix from a
relabeled contingency table (seg_metrics.py:26-46), tp/fp/fn →
precision/recall/accuracy/f1 at an IoU threshold (:49-89), DSB ``Accuracy``
(:92-105) and ``AveragePrecision`` over IoU 0.50:0.05:0.95 (:108-123).
Host-side numpy; operates on final integer label volumes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .seg_compat import contingency_table


def precision(tp, fp, fn):
    return tp / (tp + fp) if tp > 0 else 0


def recall(tp, fp, fn):
    return tp / (tp + fn) if tp > 0 else 0


def accuracy(tp, fp, fn):
    return tp / (tp + fp + fn) if tp > 0 else 0


def f1(tp, fp, fn):
    return (2 * tp) / (2 * tp + fp + fn) if tp > 0 else 0


def _relabel(input):
    _, unique_labels = np.unique(input, return_inverse=True)
    return unique_labels.reshape(input.shape)


def _iou_matrix(gt, seg):
    gt = _relabel(gt)
    seg = _relabel(seg)
    n_inter = contingency_table(gt, seg)
    n_gt = n_inter.sum(axis=1, keepdims=True)
    n_seg = n_inter.sum(axis=0, keepdims=True)
    n_union = n_gt + n_seg - n_inter
    iou_matrix = n_inter / n_union
    assert 0 <= np.min(iou_matrix) <= np.max(iou_matrix) <= 1
    return iou_matrix


class SegmentationMetrics:
    """precision/recall/accuracy/f1 between gt and predicted instances at a
    given IoU threshold; contingency computed eagerly at construction."""

    def __init__(self, gt, seg):
        self.iou_matrix = _iou_matrix(gt, seg)

    def metrics(self, iou_threshold) -> Dict[str, float]:
        # ignore background (label 0 row/column)
        iou_matrix = self.iou_matrix[1:, 1:]
        detection_matrix = (iou_matrix > iou_threshold).astype(np.uint8)
        n_gt, n_seg = detection_matrix.shape

        trivial = min(n_gt, n_seg) == 0 or np.all(detection_matrix == 0)
        if trivial:
            tp = fp = fn = 0
        else:
            tp = np.count_nonzero(detection_matrix.sum(axis=1))
            fn = n_gt - tp
            fp = n_seg - np.count_nonzero(detection_matrix.sum(axis=0))

        return {
            "precision": precision(tp, fp, fn),
            "recall": recall(tp, fp, fn),
            "accuracy": accuracy(tp, fp, fn),
            "f1": f1(tp, fp, fn),
        }


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
        return np.mean([sm.metrics(iou)["accuracy"] for iou in self.iou_range])
