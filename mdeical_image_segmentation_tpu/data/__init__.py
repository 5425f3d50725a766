from .collate import BatchLoader, BUSIDataCollator, DRIVEDataCollator, SliceCollator
from .png2d import BUSIDataset, DRIVEDataset, SliceDataset, SyntheticSliceDataset, nearest_resize

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
]
