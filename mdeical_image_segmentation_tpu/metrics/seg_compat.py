"""skimage.metrics behavioral replacements (numpy; skimage unavailable).

Used by the 3D metric registry and instance-segmentation metrics:

- ``contingency_table(im_true, im_test)`` — dense co-occurrence count matrix
  (skimage returns sparse; callers here use it densely), with optional
  ``ignore_labels`` excluding pixels by their *true* label;
- ``adapted_rand_error`` — SNEMI3D Adapted Rand error, the exact
  pairs-counting formulation of skimage (sum of squares minus the diagonal
  n terms), returning (are, precision, recall);
- ``peak_signal_noise_ratio`` / ``mean_squared_error`` — skimage conventions
  (float images assume the [-1, 1] dtype range ⇒ data_range 2 unless the
  image is non-negative ⇒ 1; integer images use the dtype range).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _relabel_dense(a: np.ndarray) -> Tuple[np.ndarray, int]:
    _, inv = np.unique(a, return_inverse=True)
    return inv.reshape(a.shape), int(inv.max()) + 1


def contingency_table(
    im_true: np.ndarray,
    im_test: np.ndarray,
    *,
    ignore_labels: Sequence[int] = (),
    normalize: bool = False,
) -> np.ndarray:
    """Dense (n_true_labels, n_test_labels) co-occurrence counts, indexed by
    the sorted unique labels of each image."""
    true_flat = im_true.ravel()
    test_flat = im_test.ravel()
    if ignore_labels:
        keep = ~np.isin(true_flat, ignore_labels)
        true_flat = true_flat[keep]
        test_flat = test_flat[keep]
    true_labels, true_idx = np.unique(true_flat, return_inverse=True)
    test_labels, test_idx = np.unique(test_flat, return_inverse=True)
    n_true, n_test = len(true_labels), len(test_labels)
    counts = np.bincount(
        true_idx * n_test + test_idx, minlength=n_true * n_test
    ).reshape(n_true, n_test).astype(np.float64)
    if normalize:
        counts /= counts.sum()
    return counts


def adapted_rand_error(
    image_true: np.ndarray,
    image_test: np.ndarray,
    *,
    ignore_labels: Sequence[int] = (0,),
    alpha: float = 0.5,
) -> Tuple[float, float, float]:
    """SNEMI3D Adapted Rand error: (are, precision, recall).

    skimage-parity pairs-counting formulation: with contingency counts p_ij,
    row sums a_i, col sums b_j over the non-ignored pixels,
    sum_p2 = Σ p_ij² − n, sum_a2 = Σ a_i² − n, sum_b2 = Σ b_j² − n,
    precision = sum_p2/sum_b2, recall = sum_p2/sum_a2,
    are = 1 − sum_p2 / (α·sum_a2 + (1−α)·sum_b2).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    p_ij = contingency_table(
        image_true, image_test, ignore_labels=ignore_labels, normalize=False
    )
    n = p_ij.sum()
    sum_p2 = float((p_ij * p_ij).sum() - n)
    a_i = p_ij.sum(axis=1)
    b_j = p_ij.sum(axis=0)
    sum_a2 = float(a_i @ a_i - n)
    sum_b2 = float(b_j @ b_j - n)
    precision = sum_p2 / sum_b2 if sum_b2 > 0 else 0.0
    recall = sum_p2 / sum_a2 if sum_a2 > 0 else 0.0
    denom = alpha * sum_a2 + (1.0 - alpha) * sum_b2
    fscore = sum_p2 / denom if denom > 0 else 0.0
    return 1.0 - fscore, precision, recall


def _data_range(image_true: np.ndarray) -> float:
    if np.issubdtype(image_true.dtype, np.integer):
        info = np.iinfo(image_true.dtype)
        return float(info.max) - float(info.min)
    # float images: skimage assumes the (-1, 1) dtype range, or (0, 1) when
    # the image is non-negative
    return 2.0 if image_true.min() < 0 else 1.0


def peak_signal_noise_ratio(
    image_true: np.ndarray,
    image_test: np.ndarray,
    *,
    data_range: Optional[float] = None,
) -> float:
    if data_range is None:
        data_range = _data_range(image_true)
    err = mean_squared_error(image_true, image_test)
    if err == 0:
        return float("inf")
    return float(10 * np.log10((data_range**2) / err))


def mean_squared_error(image0: np.ndarray, image1: np.ndarray) -> float:
    image0 = np.asarray(image0, dtype=np.float64)
    image1 = np.asarray(image1, dtype=np.float64)
    return float(np.mean((image0 - image1) ** 2))
