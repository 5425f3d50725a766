"""Surface-distance metrics: Dice, Jaccard, HD95, ASD.

Replaces the reference's medpy dependency (`calculate_metric_percase`,
/root/reference/trainer/metrcis.py:112-124) with a from-scratch
implementation of the same definitions (medpy is not available here):

- surface extraction: voxels of the binary object removed by one binary
  erosion with the connectivity-1 structuring element;
- one-directional surface distances: euclidean distance transform of the
  complement of the reference surface, sampled at the result surface;
- ``hd95``: 95th percentile over the *symmetric* pooled distances;
- ``asd``: mean of the one-directional distances result → reference.

Host-side numpy/scipy — these run on final binary masks, not in the train loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage


def _surface_distances(
    result: np.ndarray, reference: np.ndarray, voxelspacing=None
) -> np.ndarray:
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    if not result.any():
        raise RuntimeError("the result array is empty; surface distance undefined")
    if not reference.any():
        raise RuntimeError("the reference array is empty; surface distance undefined")
    footprint = ndimage.generate_binary_structure(result.ndim, 1)
    result_border = result ^ ndimage.binary_erosion(
        result, structure=footprint, iterations=1
    )
    reference_border = reference ^ ndimage.binary_erosion(
        reference, structure=footprint, iterations=1
    )
    dt = ndimage.distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def hd95(result: np.ndarray, reference: np.ndarray, voxelspacing=None) -> float:
    """95th-percentile symmetric Hausdorff distance (medpy.binary.hd95 parity)."""
    hd1 = _surface_distances(result, reference, voxelspacing)
    hd2 = _surface_distances(reference, result, voxelspacing)
    return float(np.percentile(np.hstack((hd1, hd2)), 95))


def asd(result: np.ndarray, reference: np.ndarray, voxelspacing=None) -> float:
    """Average surface distance result→reference (medpy.binary.asd parity)."""
    return float(_surface_distances(result, reference, voxelspacing).mean())


def assd(result: np.ndarray, reference: np.ndarray, voxelspacing=None) -> float:
    """Average *symmetric* surface distance (medpy.binary.assd parity)."""
    return float(
        np.mean(
            (
                _surface_distances(result, reference, voxelspacing).mean(),
                _surface_distances(reference, result, voxelspacing).mean(),
            )
        )
    )


def dc(result: np.ndarray, reference: np.ndarray) -> float:
    """Binary Dice coefficient (medpy.binary.dc parity)."""
    r = result.astype(bool)
    g = reference.astype(bool)
    intersection = np.count_nonzero(r & g)
    size_sum = np.count_nonzero(r) + np.count_nonzero(g)
    return 2.0 * intersection / size_sum if size_sum > 0 else 0.0


def jc(result: np.ndarray, reference: np.ndarray) -> float:
    """Binary Jaccard coefficient (medpy.binary.jc parity)."""
    r = result.astype(bool)
    g = reference.astype(bool)
    union = np.count_nonzero(r | g)
    return float(np.count_nonzero(r & g) / union) if union > 0 else 0.0


def calculate_metric_percase(
    pred: np.ndarray, gt: np.ndarray
) -> Tuple[float, float, float, float]:
    """(dice, jaccard, hd95, asd) per case — reference metrcis.py:112-124."""
    return dc(pred, gt), jc(pred, gt), hd95(pred, gt), asd(pred, gt)
