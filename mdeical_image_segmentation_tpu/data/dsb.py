"""DSB2018-style 2D dataset (reference dataset/unet3d_dataset/dsb.py).

Loads all ``images/`` (+ ``masks/`` for train/val) into memory via imageio,
expands to the reference's C(Z)HW layout for the transform pipelines
(dsb.py:92-108); test phase returns (image, path) with a custom collate.
"""

from __future__ import annotations

import collections.abc
import os
from typing import List, Tuple

import imageio
import numpy as np

from ..logging_utils import get_logger
from ..transforms.volume import Transformer
from .hdf5 import ConfigDataset
from .volume_utils import calculate_stats

logger = get_logger("DSB2018Dataset")


def dsb_prediction_collate(batch):
    """Mini-batch of (images, paths) at test time (reference dsb.py:15-29)."""
    error_msg = "batch must contain arrays or str; found {}"
    if isinstance(batch[0], np.ndarray):
        return np.stack(batch, 0)
    if isinstance(batch[0], str):
        return list(batch)
    if isinstance(batch[0], collections.abc.Sequence):
        transposed = zip(*batch)
        return [dsb_prediction_collate(samples) for samples in transposed]
    raise TypeError(error_msg.format(type(batch[0])))


class DSB2018Dataset(ConfigDataset):
    def __init__(self, root_dir, phase, transformer_config, expand_dims=True):
        assert os.path.isdir(root_dir), f"{root_dir} is not a directory"
        assert phase in ["train", "val", "test"]
        self.phase = phase

        images_dir = os.path.join(root_dir, "images")
        assert os.path.isdir(images_dir)
        self.images, self.paths = self._load_files(images_dir, expand_dims)
        self.file_path = images_dir

        stats = calculate_stats(None, True)
        transformer = Transformer(transformer_config, stats)
        self.raw_transform = transformer.raw_transform()

        if phase != "test":
            masks_dir = os.path.join(root_dir, "masks")
            assert os.path.isdir(masks_dir)
            self.masks, _ = self._load_files(masks_dir, expand_dims)
            assert len(self.images) == len(self.masks)
            self.masks_transform = transformer.label_transform()
        else:
            self.masks = None
            self.masks_transform = None

    def __getitem__(self, idx):
        if idx >= len(self):
            raise StopIteration
        img = self.images[idx]
        if self.phase != "test":
            mask = self.masks[idx]
            return self.raw_transform(img), self.masks_transform(mask)
        return self.raw_transform(img), self.paths[idx]

    def __len__(self):
        return len(self.images)

    @classmethod
    def prediction_collate(cls, batch):
        return dsb_prediction_collate(batch)

    @classmethod
    def create_datasets(cls, dataset_config, phase):
        phase_config = dataset_config[phase]
        transformer_config = phase_config["transformer"]
        file_paths = phase_config["file_paths"]
        expand_dims = dataset_config.get("expand_dims", True)
        return [cls(file_paths[0], phase, transformer_config, expand_dims)]

    @staticmethod
    def _load_files(dir: str, expand_dims: bool) -> Tuple[List[np.ndarray], List[str]]:
        files_data, paths = [], []
        for file in sorted(os.listdir(dir)):
            path = os.path.join(dir, file)
            img = np.asarray(imageio.imread(path))
            if expand_dims:
                dims = img.ndim
                img = np.expand_dims(img, axis=0)
                if dims == 3:
                    img = np.transpose(img, (3, 0, 1, 2))
            files_data.append(img)
            paths.append(path)
        return files_data, paths
