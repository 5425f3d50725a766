"""Patch indexing over volumes: SliceBuilder / FilterSliceBuilder.

Reference: /root/reference/dataset/unet3d_dataset/utils.py:40-179.  Generates
(z, y, x[, c]) slice tuples tiling a DxHxW (or CxDxHxW) volume with a given
patch/stride shape; ``_gen_indices`` appends a final offset patch so the tail
is always covered (utils.py:119-125).  ``FilterSliceBuilder`` drops patches
whose non-ignore label fraction is below a threshold, with a 1% random slack
acceptance from RandomState(47) (utils.py:133-163).

These run at dataset-construction time on the host; the fixed patch shapes
they produce are exactly what keeps the device-side programs static-shaped.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..configs.registry import Registry
from ..logging_utils import get_logger

logger = get_logger("Dataset")

SLICE_BUILDERS = Registry("slice_builder")


@SLICE_BUILDERS.register("SliceBuilder")
class SliceBuilder:
    """Builds patch slice positions for raw/label/weight arrays."""

    def __init__(self, raw_dataset, label_dataset, weight_dataset, patch_shape,
                 stride_shape, **kwargs):
        patch_shape = tuple(patch_shape)
        stride_shape = tuple(stride_shape)
        if not kwargs.get("skip_shape_check", False):
            self._check_patch_shape(patch_shape)

        self._raw_slices = self._build_slices(raw_dataset, patch_shape, stride_shape)
        if label_dataset is None:
            self._label_slices = None
        else:
            self._label_slices = self._build_slices(
                label_dataset, patch_shape, stride_shape
            )
            assert len(self._raw_slices) == len(self._label_slices)
        if weight_dataset is None:
            self._weight_slices = None
        else:
            self._weight_slices = self._build_slices(
                weight_dataset, patch_shape, stride_shape
            )
            assert len(self.raw_slices) == len(self._weight_slices)

    @property
    def raw_slices(self):
        return self._raw_slices

    @property
    def label_slices(self):
        return self._label_slices

    @property
    def weight_slices(self):
        return self._weight_slices

    @staticmethod
    def _build_slices(dataset, patch_shape, stride_shape) -> List[Tuple[slice, ...]]:
        slices = []
        if dataset.ndim == 4:
            in_channels, i_z, i_y, i_x = dataset.shape
        else:
            i_z, i_y, i_x = dataset.shape
        k_z, k_y, k_x = patch_shape
        s_z, s_y, s_x = stride_shape
        for z in SliceBuilder._gen_indices(i_z, k_z, s_z):
            for y in SliceBuilder._gen_indices(i_y, k_y, s_y):
                for x in SliceBuilder._gen_indices(i_x, k_x, s_x):
                    slice_idx = (
                        slice(z, z + k_z),
                        slice(y, y + k_y),
                        slice(x, x + k_x),
                    )
                    if dataset.ndim == 4:
                        slice_idx = (slice(0, in_channels),) + slice_idx
                    slices.append(slice_idx)
        return slices

    @staticmethod
    def _gen_indices(i, k, s):
        assert i >= k, "Sample size has to be bigger than the patch size"
        j = 0
        for j in range(0, i - k + 1, s):
            yield j
        if j + k < i:
            yield i - k

    @staticmethod
    def _check_patch_shape(patch_shape):
        assert len(patch_shape) == 3, "patch_shape must be a 3D tuple"
        assert patch_shape[1] >= 64 and patch_shape[2] >= 64, (
            "Height and Width must be greater or equal 64"
        )


@SLICE_BUILDERS.register("FilterSliceBuilder")
class FilterSliceBuilder(SliceBuilder):
    """Drop patches containing more than `1 - threshold` background/ignore."""

    def __init__(self, raw_dataset, label_dataset, weight_dataset, patch_shape,
                 stride_shape, ignore_index=None, threshold=0.6,
                 slack_acceptance=0.01, **kwargs):
        super().__init__(raw_dataset, label_dataset, weight_dataset, patch_shape,
                         stride_shape, **kwargs)
        if label_dataset is None:
            return

        rand_state = np.random.RandomState(47)

        def ignore_predicate(raw_label_idx):
            label_idx = raw_label_idx[1]
            patch = label_dataset[label_idx]
            if ignore_index is not None:
                patch = np.copy(patch)
                patch[patch == ignore_index] = 0
            non_ignore = np.count_nonzero(patch != 0) / patch.size
            return non_ignore > threshold or rand_state.rand() < slack_acceptance

        logger.info("Filtering slices...")
        filtered = list(filter(ignore_predicate,
                               zip(self.raw_slices, self.label_slices)))
        raw_slices, label_slices = zip(*filtered) if filtered else ((), ())
        self._raw_slices = list(raw_slices)
        self._label_slices = list(label_slices)


def get_slice_builder(raws, labels, weight_maps, config: Dict[str, Any]):
    """Name-dispatched construction (reference utils.py:175-179)."""
    assert "name" in config
    logger.info(f"Slice builder config: {config}")
    cls = SLICE_BUILDERS.get(config["name"])
    return cls(raws, labels, weight_maps, **{k: v for k, v in config.items()
                                             if k != "name"})
