"""2D segmentation losses (pure JAX), reference model/unet2d/loss.py parity.

Each loss takes ``(logits, targets)`` in channels-last layout and applies the
sigmoid internally, exactly like the reference classes (loss.py:21-57).  The
reductions are global over the whole batch (the reference sums over all
elements of the batch tensor, not per-sample).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.msssim import ms_ssim


def f1_loss(logits: jax.Array, targets: jax.Array, epsilon: float = 1e-7) -> jax.Array:
    """1 − soft F1 over the whole batch (reference F1Loss, loss.py:46-57)."""
    probs = jax.nn.sigmoid(logits)
    tp = jnp.sum(probs * targets)
    precision = tp / (jnp.sum(probs) + epsilon)
    recall = tp / (jnp.sum(targets) + epsilon)
    f1 = 2.0 * precision * recall / (precision + recall + epsilon)
    return 1.0 - f1


def iou_loss(logits: jax.Array, targets: jax.Array, epsilon: float = 1e-7) -> jax.Array:
    """1 − soft IoU over the whole batch (reference IoULoss, loss.py:32-42)."""
    probs = jax.nn.sigmoid(logits)
    intersection = jnp.sum(probs * targets)
    union = jnp.sum(probs) + jnp.sum(targets) - intersection
    return 1.0 - (intersection + epsilon) / (union + epsilon)


def msssim_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """1 − MS-SSIM(sigmoid(logits), targets), data_range=1
    (reference MSSSIMLoss, loss.py:21-28)."""
    probs = jax.nn.sigmoid(logits)
    return 1.0 - ms_ssim(probs, targets, data_range=1.0)


def segmentation_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Hybrid pixel/patch/map-level loss: F1 + MS-SSIM + IoU
    (reference SegmentationLoss, loss.py:59-70, per the UNet-3+ paper)."""
    return (
        f1_loss(logits, targets)
        + msssim_loss(logits, targets)
        + iou_loss(logits, targets)
    )


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss parity,
    used by the classic UNet head — reference unet.py:1186-1189)."""
    # max(x,0) - x*t + log1p(exp(-|x|)): the numerically stable form.
    x = logits
    loss = jnp.maximum(x, 0.0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy over channels-last logits.

    ``targets`` is integer class ids of shape (N, ...) (torch CrossEntropyLoss
    parity for the multi-class classic-UNet head, reference unet.py:1186-1189).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = targets.astype(jnp.int32)
    if t.ndim == logits.ndim and t.shape[-1] == 1:
        t = t[..., 0]  # accept (N, H, W, 1) class maps as (N, H, W)
    picked = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    return -picked.mean()
