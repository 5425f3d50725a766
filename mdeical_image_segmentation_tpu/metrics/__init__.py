from .metrics2d import (
    compute_dice,
    compute_iou,
    compute_metrics,
    dice_coef,
    dice_jax,
    iou_jax,
    iou_score,
    plot_first_element,
)
from .surface import asd, assd, calculate_metric_percase, dc, hd95, jc

__all__ = [
    "compute_dice",
    "compute_iou",
    "compute_metrics",
    "dice_coef",
    "dice_jax",
    "iou_jax",
    "iou_score",
    "plot_first_element",
    "asd",
    "assd",
    "calculate_metric_percase",
    "dc",
    "hd95",
    "jc",
]
