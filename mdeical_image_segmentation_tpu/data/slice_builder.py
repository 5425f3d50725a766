"""Patch indexing over volumes: SliceBuilder / FilterSliceBuilder.

Behavioral spec: /root/reference/dataset/unet3d_dataset/utils.py:40-179.
A volume of shape DxHxW (or CxDxHxW) is tiled into fixed-shape patches at
stride intervals; the enumeration must cover the tail of every axis (a final
patch flush with the end is emitted when the strided walk stops short —
utils.py:119-125), and ``FilterSliceBuilder`` must drop mostly-background
patches with the same RandomState(47) slack-acceptance stream so filtered
patch lists match the reference exactly.

These run at dataset-construction time on the host; the fixed patch shapes
they produce are exactly what keeps the device-side programs static-shaped.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Tuple

import numpy as np

from ..configs.registry import Registry
from ..logging_utils import get_logger

logger = get_logger("Dataset")

SLICE_BUILDERS = Registry("slice_builder")


def _axis_starts(extent: int, patch: int, stride: int) -> List[int]:
    """Start offsets of patches along one axis: a strided walk plus, when the
    walk doesn't reach it, one final start flush with the axis end (so the
    tail voxels are always covered — reference _gen_indices)."""
    assert extent >= patch, (
        f"volume axis ({extent}) shorter than the patch axis ({patch})"
    )
    starts = list(range(0, extent - patch + 1, stride))
    if starts[-1] + patch < extent:
        starts.append(extent - patch)
    return starts


@SLICE_BUILDERS.register("SliceBuilder")
class SliceBuilder:
    """Enumerates (z, y, x[, c]) slice tuples for raw/label/weight arrays."""

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
        """All patch windows, z-major (z → y → x), channels whole."""
        spatial = dataset.shape[-3:]
        channels = dataset.shape[0] if dataset.ndim == 4 else None
        per_axis = [
            _axis_starts(extent, patch, stride)
            for extent, patch, stride in zip(spatial, patch_shape, stride_shape)
        ]
        windows = []
        for origin in itertools.product(*per_axis):
            window = tuple(
                slice(start, start + patch)
                for start, patch in zip(origin, patch_shape)
            )
            if channels is not None:
                window = (slice(0, channels),) + window
            windows.append(window)
        return windows

    @staticmethod
    def _check_patch_shape(patch_shape):
        assert len(patch_shape) == 3, f"patch_shape needs 3 axes, got {patch_shape}"
        assert patch_shape[1] >= 64 and patch_shape[2] >= 64, (
            "patch H and W must be at least 64"
        )


@SLICE_BUILDERS.register("FilterSliceBuilder")
class FilterSliceBuilder(SliceBuilder):
    """Keeps patches whose non-ignore label fraction exceeds ``threshold``,
    plus a 1% random rescue of background patches (RandomState(47), drawn
    only for patches that fail the fraction test — stream parity with the
    reference's short-circuiting predicate)."""

    def __init__(self, raw_dataset, label_dataset, weight_dataset, patch_shape,
                 stride_shape, ignore_index=None, threshold=0.6,
                 slack_acceptance=0.01, **kwargs):
        super().__init__(raw_dataset, label_dataset, weight_dataset, patch_shape,
                         stride_shape, **kwargs)
        if label_dataset is None:
            return

        rescue_rng = np.random.RandomState(47)

        def keep(pair):
            label_window = pair[1]
            patch = label_dataset[label_window]
            if ignore_index is not None:
                patch = np.copy(patch)
                patch[patch == ignore_index] = 0
            foreground = np.count_nonzero(patch != 0) / patch.size
            return foreground > threshold or rescue_rng.rand() < slack_acceptance

        logger.info("filtering mostly-background patches")
        keep_mask = [
            keep(p) for p in zip(self.raw_slices, self.label_slices)
        ]
        self._raw_slices = [
            s for s, k in zip(self.raw_slices, keep_mask) if k
        ]
        self._label_slices = [
            s for s, k in zip(self.label_slices, keep_mask) if k
        ]
        if self._weight_slices is not None:
            # deliberate fix over the reference: it leaves weight slices
            # UNfiltered (slice_builders.py filters raws/labels only), so a
            # filtered index silently pairs each patch with a weight window
            # from a different location — filter all three streams together
            self._weight_slices = [
                s for s, k in zip(self._weight_slices, keep_mask) if k
            ]


def get_slice_builder(raws, labels, weight_maps, config: Dict[str, Any]):
    """Name-dispatched construction (reference utils.py:175-179)."""
    assert "name" in config
    logger.info(f"slice builder config: {config}")
    cls = SLICE_BUILDERS.get(config["name"])
    return cls(raws, labels, weight_maps, **{k: v for k, v in config.items()
                                             if k != "name"})
