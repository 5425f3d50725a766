"""tpuseg — TPU-native medical image segmentation framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of
``a-green-hand-jack/mdeical_image_segmentation`` (see /root/repo/SURVEY.md):

- 2D models: UNet, UNet_3Plus, UNet_3Plus_DeepSup, UNet_3Plus_DeepSup_CGM
  (reference: model/unet2d/unet.py)
- 3D models: UNet3D, ResidualUNet3D, ResidualUNetSE3D, UNet2D, ResidualUNet2D
  (reference: model/unet3d/model.py)
- Loss registry (BCE/Dice/BCEDice/GDL/WCE/PixelWiseCE/MSE/L1/SmoothL1 + the
  hybrid F1+MS-SSIM+IoU loss), metric registry (Dice/IoU/ARand/AP/PSNR/MSE,
  HD95/ASD), PNG slice + HDF5 volume datasets with SliceBuilder patching,
  deterministic seed-42 splits, host+device augmentation pipelines, a pjit
  data-parallel trainer with last/best checkpointing, a sliding-window
  predictor with overlap-averaged recomposition, and an HTTP serving endpoint
  with per-request model selection.

Everything on the compute path is jit-compiled for TPU; data layout is NHWC /
NDHWC (channels-last) which is the native TPU conv layout.
"""

__version__ = "0.1.0"

# Short alias so `import mdeical_image_segmentation_tpu as tpuseg` reads well.
# Subpackages are imported lazily to keep `import mdeical_image_segmentation_tpu`
# cheap (no jax trace / TPU init at import time).
import importlib as _importlib

_SUBMODULES = (
    "configs",
    "data",
    "infer",
    "losses",
    "metrics",
    "models",
    "ops",
    "parallel",
    "serve",
    "train",
    "transforms",
    "utils",
)


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
