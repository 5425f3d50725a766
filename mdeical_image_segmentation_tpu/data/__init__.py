from .collate import BatchLoader, BUSIDataCollator, DRIVEDataCollator, SliceCollator
from .png2d import BUSIDataset, DRIVEDataset, SliceDataset, SyntheticSliceDataset, nearest_resize
from .slice_builder import FilterSliceBuilder, SliceBuilder, get_slice_builder
from .volume_utils import (
    calculate_stats,
    create_padded_indexes,
    mirror_pad,
    remove_padding,
    traverse_h5_paths,
)
from .hdf5 import AbstractHDF5Dataset, ConfigDataset, LazyHDF5Dataset, StandardHDF5Dataset
from .dsb import DSB2018Dataset, dsb_prediction_collate
from .loaders import (
    ConcatDataset,
    DATASETS,
    VolumeLoader,
    default_prediction_collate,
    get_test_loaders,
    get_train_loaders,
)

__all__ = [
    "BatchLoader",
    "BUSIDataCollator",
    "DRIVEDataCollator",
    "SliceCollator",
    "BUSIDataset",
    "DRIVEDataset",
    "SliceDataset",
    "SyntheticSliceDataset",
    "nearest_resize",
    "FilterSliceBuilder",
    "SliceBuilder",
    "get_slice_builder",
    "calculate_stats",
    "create_padded_indexes",
    "mirror_pad",
    "remove_padding",
    "traverse_h5_paths",
    "AbstractHDF5Dataset",
    "ConfigDataset",
    "LazyHDF5Dataset",
    "StandardHDF5Dataset",
    "DSB2018Dataset",
    "dsb_prediction_collate",
    "ConcatDataset",
    "DATASETS",
    "VolumeLoader",
    "default_prediction_collate",
    "get_test_loaders",
    "get_train_loaders",
]
