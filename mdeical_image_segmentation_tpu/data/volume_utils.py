"""Volume helpers: global stats, halo mirror padding, H5 path traversal.

Reference: calculate_stats (dataset/unet3d_dataset/utils.py:290-311),
mirror_pad / remove_padding (utils.py:314-361), traverse_h5_paths
(hdf5.py:27-41), _create_padded_indexes (hdf5.py:20-24).
"""

from __future__ import annotations

import glob
import os
from itertools import chain
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def calculate_stats(img: Optional[np.ndarray], skip: bool = False) -> Dict[str, Any]:
    """1%/99.6% percentiles + mean/std over the whole raw volume."""
    if not skip:
        pmin, pmax, mean, std = (
            np.percentile(img, 1),
            np.percentile(img, 99.6),
            np.mean(img),
            np.std(img),
        )
    else:
        pmin = pmax = mean = std = None
    return {"pmin": pmin, "pmax": pmax, "mean": mean, "std": std}


def mirror_pad(image: np.ndarray, padding_shape: Sequence[int]) -> np.ndarray:
    """Reflect-pad each spatial dim by its halo (ZYX; channel dim untouched)."""
    assert len(padding_shape) == 3, (
        "halo needs one entry per spatial axis (Z, Y, X)"
    )
    if any(p < 0 for p in padding_shape):
        raise ValueError(f"negative halo entries: {tuple(padding_shape)}")
    if all(p == 0 for p in padding_shape):
        return image
    pad_width = [(p, p) for p in padding_shape]
    if image.ndim == 4:
        pad_width = [(0, 0)] + pad_width
    return np.pad(image, pad_width, mode="reflect")


def remove_padding(m: np.ndarray, padding_shape: Optional[Sequence[int]]) -> np.ndarray:
    """Strip the halo margins added by mirror_pad (leading dims untouched)."""
    if padding_shape is None:
        return m
    return m[(..., *(slice(p, -p or None) for p in padding_shape))]


def create_padded_indexes(
    indexes: Sequence[slice], halo_shape: Sequence[int]
) -> Tuple[slice, ...]:
    """Patch slices into the mirror-padded volume: same start, stop + 2*halo."""
    return tuple(
        slice(index.start, index.stop + 2 * halo)
        for index, halo in zip(indexes, halo_shape)
    )


def traverse_h5_paths(file_paths: Sequence[str]) -> List[str]:
    """Expand directories to the *.h5/hdf/hdf5/hd5 files inside them."""
    assert isinstance(file_paths, list)
    results = []
    for file_path in file_paths:
        if os.path.isdir(file_path):
            iters = [
                glob.glob(os.path.join(file_path, ext))
                for ext in ["*.h5", "*.hdf", "*.hdf5", "*.hd5"]
            ]
            for fp in chain(*iters):
                results.append(fp)
        else:
            results.append(file_path)
    return results
