from .image import (
    max_pool_nd,
    max_pool2d,
    avg_pool_nd,
    upsample_bilinear2d,
    upsample_nearest,
    resize_bilinear,
    interpolate_nearest_nd,
    center_crop,
)
from .msssim import ssim, ms_ssim
from .overlap import overlap_add, overlap_add_into
from . import initializers

__all__ = [
    "max_pool_nd",
    "max_pool2d",
    "avg_pool_nd",
    "upsample_bilinear2d",
    "upsample_nearest",
    "resize_bilinear",
    "interpolate_nearest_nd",
    "center_crop",
    "ssim",
    "ms_ssim",
    "overlap_add",
    "overlap_add_into",
    "initializers",
]
