"""HDF5 volumetric datasets: standard (RAM-cached) and lazy variants.

Reference: /root/reference/dataset/unet3d_dataset/hdf5.py.  Per-file dataset
iterating patch-by-patch via the SliceBuilder; optional global mean/std
normalization stats over the whole raw volume; train/val phases return
transformed (raw, label[, weight]) patches, the test phase returns
(halo-padded raw patch, spatial slice index) pairs for the sliding-window
predictor.  ``create_datasets`` loops file_paths (directories auto-globbed),
skipping corrupt files with a logged traceback (hdf5.py:266-267) — the
reference's only fault-tolerance mechanism, preserved.

Samples come out channels-last ((Z, Y, X, C) numpy) via the pipelines'
terminal ToTensor, ready for batching + device_put.
"""

from __future__ import annotations

from abc import abstractmethod
from typing import Any, Dict, List, Optional

import h5py
import numpy as np

from ..logging_utils import get_logger
from ..transforms.volume import Transformer
from .slice_builder import get_slice_builder
from .volume_utils import calculate_stats, create_padded_indexes, mirror_pad, traverse_h5_paths

logger = get_logger("HDF5Dataset")


class ConfigDataset:
    """Dataset interface for the config-driven loaders (reference
    dataset/unet3d_dataset/utils.py:13-37)."""

    def __getitem__(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError

    @classmethod
    def create_datasets(cls, dataset_config, phase):
        raise NotImplementedError

    @classmethod
    def prediction_collate(cls, batch):
        from .loaders import default_prediction_collate

        return default_prediction_collate(batch)


class AbstractHDF5Dataset(ConfigDataset):
    def __init__(
        self,
        file_path: str,
        phase: str,
        slice_builder_config: Dict[str, Any],
        transformer_config: Dict[str, Any],
        raw_internal_path: str = "raw",
        label_internal_path: str = "label",
        weight_internal_path: Optional[str] = None,
        global_normalization: bool = True,
    ):
        assert phase in ["train", "val", "test"]
        self.phase = phase
        self.file_path = file_path
        self.raw_internal_path = raw_internal_path
        self.label_internal_path = label_internal_path
        self.weight_internal_path = weight_internal_path

        self.halo_shape = slice_builder_config.get("halo_shape", [0, 0, 0])

        if global_normalization:
            logger.info("computing global normalization stats over the raw volume")
            with h5py.File(file_path, "r") as f:
                raw = f[raw_internal_path][:]
                stats = calculate_stats(raw)
        else:
            stats = calculate_stats(None, True)

        self.transformer = Transformer(transformer_config, stats)
        self.raw_transform = self.transformer.raw_transform()

        if phase != "test":
            self.label_transform = self.transformer.label_transform()
            if weight_internal_path is not None:
                self.weight_transform = self.transformer.weight_transform()
            else:
                self.weight_transform = None
            self._check_volume_sizes()
        else:
            patch_shape = slice_builder_config.get("patch_shape")
            stride_shape = slice_builder_config.get("stride_shape")
            if sum(self.halo_shape) != 0 and patch_shape != stride_shape:
                logger.warning(
                    f"halo {self.halo_shape} with patch_shape {patch_shape} != "
                    f"stride_shape {stride_shape}: overlapping windows are "
                    f"predicted twice — equal shapes tile fastest"
                )

        with h5py.File(file_path, "r") as f:
            raw = f[raw_internal_path]
            label = f[label_internal_path] if phase != "test" else None
            weight_map = (
                f[weight_internal_path] if weight_internal_path is not None else None
            )
            slice_builder = get_slice_builder(
                raw, label, weight_map, slice_builder_config
            )
            self.raw_slices = slice_builder.raw_slices
            self.label_slices = slice_builder.label_slices
            self.weight_slices = slice_builder.weight_slices

        self.patch_count = len(self.raw_slices)
        logger.info(f"{self.patch_count} patches from {file_path}")

    @abstractmethod
    def get_raw_patch(self, idx):
        raise NotImplementedError

    @abstractmethod
    def get_label_patch(self, idx):
        raise NotImplementedError

    @abstractmethod
    def get_weight_patch(self, idx):
        raise NotImplementedError

    @abstractmethod
    def get_raw_padded_patch(self, idx):
        raise NotImplementedError

    def volume_shape(self):
        with h5py.File(self.file_path, "r") as f:
            raw = f[self.raw_internal_path]
            return raw.shape if raw.ndim == 3 else raw.shape[1:]

    def __getitem__(self, idx):
        if idx >= len(self):
            raise StopIteration

        raw_idx = self.raw_slices[idx]
        if self.phase == "test":
            if len(raw_idx) == 4:
                raw_idx = raw_idx[1:]
                raw_idx_padded = (slice(None),) + create_padded_indexes(
                    raw_idx, self.halo_shape
                )
            else:
                raw_idx_padded = create_padded_indexes(raw_idx, self.halo_shape)
            raw_patch_transformed = self.raw_transform(
                self.get_raw_padded_patch(raw_idx_padded)
            )
            return raw_patch_transformed, raw_idx

        raw_patch_transformed = self.raw_transform(self.get_raw_patch(raw_idx))
        label_idx = self.label_slices[idx]
        label_patch_transformed = self.label_transform(self.get_label_patch(label_idx))
        if self.weight_internal_path is not None:
            weight_idx = self.weight_slices[idx]
            weight_patch_transformed = self.weight_transform(
                self.get_weight_patch(weight_idx)
            )
            return (
                raw_patch_transformed,
                label_patch_transformed,
                weight_patch_transformed,
            )
        return raw_patch_transformed, label_patch_transformed

    def __len__(self):
        return self.patch_count

    def _check_volume_sizes(self):
        def _volume_shape(volume):
            return volume.shape if volume.ndim == 3 else volume.shape[1:]

        with h5py.File(self.file_path, "r") as f:
            raw = f[self.raw_internal_path]
            label = f[self.label_internal_path]
            assert raw.ndim in [3, 4], f"raw must be DxHxW or CxDxHxW, got ndim={raw.ndim}"
            assert label.ndim in [3, 4], (
                f"label must be DxHxW or CxDxHxW, got ndim={label.ndim}"
            )
            assert _volume_shape(raw) == _volume_shape(label), (
                f"raw {_volume_shape(raw)} and label {_volume_shape(label)} "
                "spatial shapes differ"
            )
            if self.weight_internal_path is not None:
                weight_map = f[self.weight_internal_path]
                assert weight_map.ndim in [3, 4], (
                    f"weight map must be DxHxW or CxDxHxW, got ndim={weight_map.ndim}"
                )
                assert _volume_shape(raw) == _volume_shape(weight_map), (
                    f"raw {_volume_shape(raw)} and weight map "
                    f"{_volume_shape(weight_map)} spatial shapes differ"
                )

    @classmethod
    def create_datasets(cls, dataset_config, phase) -> List["AbstractHDF5Dataset"]:
        phase_config = dataset_config[phase]
        transformer_config = phase_config["transformer"]
        slice_builder_config = phase_config["slice_builder"]
        file_paths = traverse_h5_paths(phase_config["file_paths"])

        datasets = []
        for file_path in file_paths:
            try:
                logger.info(f"building {phase} dataset from {file_path}")
                dataset = cls(
                    file_path=file_path,
                    phase=phase,
                    slice_builder_config=slice_builder_config,
                    transformer_config=transformer_config,
                    raw_internal_path=dataset_config.get("raw_internal_path", "raw"),
                    label_internal_path=dataset_config.get(
                        "label_internal_path", "label"
                    ),
                    weight_internal_path=dataset_config.get(
                        "weight_internal_path", None
                    ),
                    global_normalization=dataset_config.get(
                        "global_normalization", None
                    ),
                )
                datasets.append(dataset)
            except Exception:
                logger.error(f"unreadable {phase} file {file_path} — skipped", exc_info=True)
        return datasets


class StandardHDF5Dataset(AbstractHDF5Dataset):
    """Loads whole arrays into RAM lazily on first access (hdf5.py:271-339)."""

    def __init__(self, file_path, phase, slice_builder_config, transformer_config,
                 raw_internal_path="raw", label_internal_path="label",
                 weight_internal_path=None, global_normalization=True):
        super().__init__(
            file_path=file_path, phase=phase,
            slice_builder_config=slice_builder_config,
            transformer_config=transformer_config,
            raw_internal_path=raw_internal_path,
            label_internal_path=label_internal_path,
            weight_internal_path=weight_internal_path,
            global_normalization=global_normalization,
        )
        self._raw = None
        self._raw_padded = None
        self._label = None
        self._weight_map = None

    def _cached(self, attr, internal_path):
        if getattr(self, attr) is None:
            with h5py.File(self.file_path, "r") as f:
                assert internal_path in f, (
                    f"{self.file_path} has no dataset '{internal_path}'"
                )
                setattr(self, attr, f[internal_path][:])
        return getattr(self, attr)

    def get_raw_patch(self, idx):
        return self._cached("_raw", self.raw_internal_path)[idx]

    def get_label_patch(self, idx):
        return self._cached("_label", self.label_internal_path)[idx]

    def get_weight_patch(self, idx):
        return self._cached("_weight_map", self.weight_internal_path)[idx]

    def get_raw_padded_patch(self, idx):
        if self._raw_padded is None:
            with h5py.File(self.file_path, "r") as f:
                assert self.raw_internal_path in f, (
                    f"{self.file_path} has no dataset '{self.raw_internal_path}'"
                )
                self._raw_padded = mirror_pad(
                    f[self.raw_internal_path][:], self.halo_shape
                )
        return self._raw_padded[idx]


class LazyHDF5Dataset(AbstractHDF5Dataset):
    """Reopens the file per access; memoizes the padded raw back into the H5
    (hdf5.py:342-389).  Slow but low-memory — for volumes larger than RAM."""

    def __init__(self, file_path, phase, slice_builder_config, transformer_config,
                 raw_internal_path="raw", label_internal_path="label",
                 weight_internal_path=None, global_normalization=False):
        super().__init__(
            file_path=file_path, phase=phase,
            slice_builder_config=slice_builder_config,
            transformer_config=transformer_config,
            raw_internal_path=raw_internal_path,
            label_internal_path=label_internal_path,
            weight_internal_path=weight_internal_path,
            global_normalization=global_normalization,
        )
        logger.info("lazy H5 access: per-patch reads, padded raw memoized in-file")

    def get_raw_patch(self, idx):
        with h5py.File(self.file_path, "r") as f:
            return f[self.raw_internal_path][idx]

    def get_label_patch(self, idx):
        with h5py.File(self.file_path, "r") as f:
            return f[self.label_internal_path][idx]

    def get_weight_patch(self, idx):
        with h5py.File(self.file_path, "r") as f:
            return f[self.weight_internal_path][idx]

    def get_raw_padded_patch(self, idx):
        # memo key includes the halo: a bare "raw_padded" (the reference's
        # key, hdf5.py) silently returns stale pads when the same file is
        # re-predicted with a different halo_shape — truncated edge patches
        # or shifted interiors, no error
        key = "raw_padded_" + "x".join(str(h) for h in self.halo_shape)
        with h5py.File(self.file_path, "r+") as f:
            if key in f:
                return f[key][idx]
            raw = f[self.raw_internal_path][:]
            raw_padded = mirror_pad(raw, self.halo_shape)
            f.create_dataset(key, data=raw_padded, compression="gzip")
            return raw_padded[idx]
