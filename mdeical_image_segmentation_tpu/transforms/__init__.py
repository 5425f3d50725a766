from .device2d import augment_batch, Augment2DConfig
from .volume import GLOBAL_RANDOM_STATE, TRANSFORMS, Transformer
from . import skimage_compat

__all__ = [
    "augment_batch",
    "Augment2DConfig",
    "GLOBAL_RANDOM_STATE",
    "TRANSFORMS",
    "Transformer",
    "skimage_compat",
]
