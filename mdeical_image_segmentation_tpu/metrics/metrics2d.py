"""2D eval metrics — reference trainer/metrcis.py parity.

``compute_metrics`` reproduces the reference eval contract
(metrcis.py:153-168) including its quirks, which matter for score parity:

- sigmoid computed as ``1 / (1 + exp(-x) + eps)`` (metrcis.py:161);
- the binarization threshold is the **mean of the sigmoided predictions**
  (metrcis.py:163), not a fixed 0.5 (a fixed threshold is available via
  ``threshold=``);
- dice denominator carries the doubled epsilon of metrcis.py:104-107;
- a pred-vs-label PNG of the first sample is dumped every call when
  ``plot_path`` is set (metrcis.py:164 writes output.png every eval).

Inputs are channels-last (N, H, W, 1) or (N, H, W); everything here is
host-side numpy (it runs on gathered eval outputs), with jit-able device
variants ``iou_jax`` / ``dice_jax`` for in-loop logging.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _squeeze_channel(a: np.ndarray) -> np.ndarray:
    if a.ndim == 4:
        assert a.shape[-1] == 1 or a.shape[1] == 1, a.shape
        a = a[..., 0] if a.shape[-1] == 1 else a[:, 0]
    return a


def compute_iou(
    preds: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> float:
    """Mean per-sample IoU after thresholding (reference metrcis.py:61-81)."""
    p = (preds > threshold).astype(np.float32)
    l = (labels > threshold).astype(np.float32)
    intersection = np.sum(p * l, axis=(1, 2))
    union = np.sum(p, axis=(1, 2)) + np.sum(l, axis=(1, 2)) - intersection
    union = np.maximum(union, 1e-6)
    return float(np.mean(intersection / union))


def compute_dice(
    preds: np.ndarray, labels: np.ndarray, threshold: float = 0.5
) -> float:
    """Mean per-sample Dice after thresholding (reference metrcis.py:84-109,
    epsilon placement preserved: (2∩+ε)/(Σp+Σl+2ε))."""
    p = (preds > threshold).astype(np.float32)
    l = (labels > threshold).astype(np.float32)
    intersection = np.sum(p * l, axis=(1, 2))
    sum_pred = np.sum(p, axis=(1, 2)) + 1e-6
    sum_lab = np.sum(l, axis=(1, 2)) + 1e-6
    dice = (2.0 * intersection + 1e-6) / (sum_pred + sum_lab)
    return float(np.mean(dice))


def iou_score(output: np.ndarray, target: np.ndarray) -> Tuple[float, float]:
    """Global binary IoU at 0.5 on sigmoided output + dice-from-iou
    (reference metrcis.py:127-141)."""
    output = 1.0 / (1.0 + np.exp(-output))
    o = output > 0.5
    t = target > 0.5
    smooth = 1e-5
    intersection = np.logical_and(o, t).sum()
    union = np.logical_or(o, t).sum()
    iou = (intersection + smooth) / (union + smooth)
    return float(iou), float(2 * iou / (iou + 1))


def dice_coef(output: np.ndarray, target: np.ndarray) -> float:
    """Global soft dice on sigmoided output (reference metrcis.py:144-150)."""
    output = 1.0 / (1.0 + np.exp(-output))
    o = output.reshape(-1)
    t = target.reshape(-1)
    smooth = 1e-5
    intersection = (o * t).sum()
    return float((2.0 * intersection + smooth) / (o.sum() + t.sum() + smooth))


def plot_first_element(
    array1: np.ndarray,
    array2: np.ndarray,
    threshold: float = 0.5,
    save_path: Optional[str] = "output.png",
) -> None:
    """Pred-vs-label grayscale panel of sample 0 (reference metrcis.py:10-57)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a1 = (np.asarray(array1) > threshold).astype(np.float32)
    a2 = (np.asarray(array2) > threshold).astype(np.float32)
    fig = plt.figure(figsize=(10, 5))
    plt.subplot(1, 2, 1)
    plt.title("Array 1 - First Element")
    plt.imshow(a1[0], cmap="gray")
    plt.axis("off")
    plt.subplot(1, 2, 2)
    plt.title("Array 2 - First Element")
    plt.imshow(a2[0], cmap="gray")
    plt.axis("off")
    if save_path is not None:
        plt.savefig(save_path)
    plt.close(fig)


def compute_metrics(
    logits: np.ndarray,
    labels: np.ndarray,
    *,
    threshold: Optional[float] = None,
    plot_path: Optional[str] = None,
) -> Dict[str, float]:
    """Eval-loop metrics (reference compute_metrics, metrcis.py:153-168).

    ``threshold=None`` uses the reference's dynamic mean-of-sigmoided-preds
    threshold; pass 0.5 for the conventional fixed threshold.
    """
    preds = _squeeze_channel(np.asarray(logits)).astype(np.float32)
    labs = _squeeze_channel(np.asarray(labels)).astype(np.float32)
    # Reference quirk: epsilon inside the sigmoid denominator (metrcis.py:161).
    preds = 1.0 / (1.0 + np.exp(-preds) + 1e-6)
    thr = float(np.mean(preds)) if threshold is None else threshold
    if plot_path is not None:
        plot_first_element(preds, labs, threshold=thr, save_path=plot_path)
    return {
        "iou": compute_iou(preds, labs, threshold=thr),
        "dice": compute_dice(preds, labs, threshold=thr),
    }


# ---------------------------------------------------------------------------
# jit-able device variants (for in-training-loop logging without host syncs)
# ---------------------------------------------------------------------------


def iou_jax(logits: jax.Array, labels: jax.Array, threshold=None) -> jax.Array:
    """Device-side mean per-sample IoU with the reference's dynamic-threshold
    semantics when ``threshold`` is None."""
    preds = 1.0 / (1.0 + jnp.exp(-logits) + 1e-6)
    thr = preds.mean() if threshold is None else threshold
    axes = tuple(range(1, preds.ndim))
    p = (preds > thr).astype(jnp.float32)
    l = (labels > thr).astype(jnp.float32)
    inter = (p * l).sum(axes)
    union = jnp.maximum(p.sum(axes) + l.sum(axes) - inter, 1e-6)
    return (inter / union).mean()


def dice_jax(logits: jax.Array, labels: jax.Array, threshold=None) -> jax.Array:
    preds = 1.0 / (1.0 + jnp.exp(-logits) + 1e-6)
    thr = preds.mean() if threshold is None else threshold
    axes = tuple(range(1, preds.ndim))
    p = (preds > thr).astype(jnp.float32)
    l = (labels > thr).astype(jnp.float32)
    inter = (p * l).sum(axes)
    denom = p.sum(axes) + l.sum(axes) + 2e-6
    return ((2.0 * inter + 1e-6) / denom).mean()


# ---------------------------------------------------------------------------
# streaming (O(batch)-memory) eval building blocks
# ---------------------------------------------------------------------------
#
# The reference's eval (metrcis.py:153-168) materializes every logit on host
# and thresholds at the global mean of the sigmoided predictions.  For eval
# sets that don't fit in host memory the trainer instead accumulates these
# per-batch sufficient statistics on device (two passes: one for the global
# mean threshold, one for the thresholded IoU/Dice).  Exactness: every valid
# sample contributes one equal-pixel-count mean, so the average of per-sample
# means equals the reference's global pixel mean, and the per-sample IoU/Dice
# sums match compute_iou/compute_dice term by term.


def _valid_mask(n_total: int, n_valid: jax.Array) -> jax.Array:
    return (jnp.arange(n_total) < n_valid).astype(jnp.float32)


def quirky_sigmoid_jax(logits: jax.Array) -> jax.Array:
    """The reference's sigmoid with epsilon inside the denominator
    (metrcis.py:161)."""
    return 1.0 / (1.0 + jnp.exp(-logits) + 1e-6)


def pred_mean_sum_jax(logits: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Sum over the first ``n_valid`` samples of each sample's mean sigmoided
    prediction.  Dividing the accumulated total by Σ n_valid reproduces the
    reference's dynamic threshold exactly (equal pixel counts per sample)."""
    preds = quirky_sigmoid_jax(logits.astype(jnp.float32))
    axes = tuple(range(1, preds.ndim))
    per_sample = preds.mean(axes)
    return (per_sample * _valid_mask(preds.shape[0], n_valid)).sum()


def multiclass_iou_dice_sums_jax(
    logits: jax.Array, labels: jax.Array, n_valid: jax.Array
):
    """(Σ per-sample macro IoU, Σ per-sample macro Dice) for C>1 heads.

    The reference's eval metrics are binary-only (metrcis.py:61-109; its
    multi-class branch stops at the CrossEntropyLoss dispatch,
    unet.py:1184-1188) — this is the natural argmax extension matching the
    serving API's argmax masks: the prediction is ``argmax_C(logits)``, each
    class contributes a binary IoU/Dice with the SAME epsilon conventions as
    compute_iou/compute_dice, and classes are macro-averaged per sample
    (background class 0 included, so an all-background sample scores 1.0
    when predicted all-background).
    """
    n, n_classes = logits.shape[0], logits.shape[-1]
    pred_cls = jnp.argmax(logits, axis=-1)  # (N, H, W)
    labs = labels
    if labs.ndim == pred_cls.ndim + 1 and labs.shape[-1] == 1:
        labs = labs[..., 0]
    labs = labs.astype(jnp.int32)
    axes = tuple(range(1, pred_cls.ndim))
    classes = jnp.arange(n_classes)
    # one-hot along a leading class axis: (C, N, H, W) booleans
    p = (pred_cls[None] == classes[:, None, None, None]).astype(jnp.float32)
    l = (labs[None] == classes[:, None, None, None]).astype(jnp.float32)
    sum_axes = tuple(a + 1 for a in axes)  # spatial axes of the (C, N, ...) view
    inter = (p * l).sum(sum_axes)  # (C, N)
    union = jnp.maximum(p.sum(sum_axes) + l.sum(sum_axes) - inter, 1e-6)
    iou = (inter / union).mean(0)  # macro over classes → (N,)
    dice = (
        (2.0 * inter + 1e-6)
        / (p.sum(sum_axes) + 1e-6 + l.sum(sum_axes) + 1e-6)
    ).mean(0)
    mask = _valid_mask(n, n_valid)
    return (iou * mask).sum(), (dice * mask).sum()


def compute_metrics_multiclass(
    logits: np.ndarray, labels: np.ndarray
) -> Dict[str, float]:
    """Host-side multi-class eval: mean per-sample macro IoU/Dice over argmax
    class maps (same math as ``multiclass_iou_dice_sums_jax``)."""
    logits = np.asarray(logits, np.float32)
    n = logits.shape[0]
    isum, dsum = multiclass_iou_dice_sums_jax(
        jnp.asarray(logits), jnp.asarray(np.asarray(labels)), jnp.int32(n)
    )
    return {"iou": float(isum) / n, "dice": float(dsum) / n}


def iou_dice_sums_jax(
    logits: jax.Array, labels: jax.Array, threshold: jax.Array, n_valid: jax.Array
):
    """(Σ per-sample IoU, Σ per-sample Dice) over the first ``n_valid``
    samples, with compute_iou/compute_dice's exact epsilon placement."""
    preds = quirky_sigmoid_jax(logits.astype(jnp.float32))
    axes = tuple(range(1, preds.ndim))
    p = (preds > threshold).astype(jnp.float32)
    l = (labels.astype(jnp.float32) > threshold).astype(jnp.float32)
    inter = (p * l).sum(axes)
    union = jnp.maximum(p.sum(axes) + l.sum(axes) - inter, 1e-6)
    iou = inter / union
    dice = (2.0 * inter + 1e-6) / (p.sum(axes) + 1e-6 + l.sum(axes) + 1e-6)
    mask = _valid_mask(preds.shape[0], n_valid)
    return (iou * mask).sum(), (dice * mask).sum()
