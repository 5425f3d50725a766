from .onehot import expand_as_one_hot
from .torch_import import (
    unet3d_params_from_torch,
    unet3plus_params_from_torch,
    unet_params_from_torch,
)
from .viz import show, show_transform_grid

__all__ = [
    "expand_as_one_hot",
    "unet3d_params_from_torch",
    "unet3plus_params_from_torch",
    "unet_params_from_torch",
    "show",
    "show_transform_grid",
]
