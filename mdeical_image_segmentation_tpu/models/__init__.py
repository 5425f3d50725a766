from .layers2d import (
    ConvBNReLU,
    DoubleConvolution,
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    UNetConv2,
    UNetUp,
    UpSample,
    crop_and_concat,
)
from .unet2d import UNet, UNet3Plus, UNet3PlusDeepSup, UNet3PlusDeepSupCGM
from .wrappers import SegOutput, UNetConfig, UNetModel, UNET_TYPES

__all__ = [
    "ConvBNReLU",
    "DoubleConvolution",
    "TorchBatchNorm",
    "TorchConv",
    "TorchConvTranspose",
    "UNetConv2",
    "UNetUp",
    "UpSample",
    "crop_and_concat",
    "UNet",
    "UNet3Plus",
    "UNet3PlusDeepSup",
    "UNet3PlusDeepSupCGM",
    "SegOutput",
    "UNetConfig",
    "UNetModel",
    "UNET_TYPES",
]
