"""Pixel-for-pixel golden parity vs the torch reference (the BASELINE north
star: "masks must match the PyTorch reference pixel-for-pixel at fp32
tolerance").

These tests import the reference implementation from /root/reference (with
in-test stubs for its unavailable deps), transfer its randomly-initialized
weights through utils.torch_import, and compare forward outputs on identical
inputs.  Skipped automatically when the reference checkout is absent — the
framework itself has no reference dependency."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="torch reference checkout not available",
)



def _install_2d_stubs():
    import types
    import importlib.machinery
    import torch

    def _stub(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms")
    tvf = _stub("torchvision.transforms.functional")

    def center_crop(img, output_size):
        h, w = img.shape[-2:]
        th, tw = output_size
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return img[..., i : i + th, j : j + tw]

    tvf.center_crop = center_crop
    tvt.functional = tvf
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.modules.setdefault("torchvision.transforms.functional", tvf)

    ms = _stub("pytorch_msssim")

    class MS_SSIM(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

    ms.MS_SSIM = MS_SSIM
    ms.ms_ssim = lambda *a, **k: None
    sys.modules.setdefault("pytorch_msssim", ms)
    return _stub


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference 2D model zoo with stubbed torchvision/msssim."""
    _install_2d_stubs()
    sys.path.insert(0, REFERENCE)
    try:
        from model.unet2d.unet import (  # noqa
            UNet as TorchUNet,
            UNet_3Plus as TorchUNet3Plus,
            UNet_3Plus_DeepSup as TorchDeepSup,
        )
    finally:
        sys.path.remove(REFERENCE)
    return TorchUNet, TorchUNet3Plus, TorchDeepSup


def _state_dict_np(m):
    return {k: v.detach().cpu().numpy() for k, v in m.state_dict().items()}


def test_classic_unet_pixel_parity(ref_models):
    import torch

    from mdeical_image_segmentation_tpu.models import UNet
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet_params_from_torch,
    )

    torch.manual_seed(0)
    tm = ref_models[0](3, 2).eval()
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    ref = np.moveaxis(ref, 1, -1)

    ours_model = UNet(in_channels=3, out_channels=2)
    variables = unet_params_from_torch(_state_dict_np(tm))
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_unet3plus_pixel_parity(ref_models):
    import torch

    from mdeical_image_segmentation_tpu.models import UNet3Plus
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet3plus_params_from_torch,
    )

    torch.manual_seed(1)
    tm = ref_models[1](1, 1).eval()
    x = np.random.RandomState(1).rand(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    ref = np.moveaxis(ref, 1, -1)

    ours_model = UNet3Plus(in_channels=1, n_classes=1)
    variables = unet3plus_params_from_torch(_state_dict_np(tm))
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_deepsup_pixel_parity_all_heads(ref_models):
    import torch

    from mdeical_image_segmentation_tpu.models import UNet3PlusDeepSup
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet3plus_params_from_torch,
    )

    torch.manual_seed(2)
    tm = ref_models[2](1, 1).eval()
    x = np.random.RandomState(2).rand(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        refs = [
            np.moveaxis(t.numpy(), 1, -1)
            for t in tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
        ]

    ours_model = UNet3PlusDeepSup(in_channels=1, n_classes=1)
    variables = unet3plus_params_from_torch(
        _state_dict_np(tm), variant="UNet_3Plus_DeepSup"
    )
    ours = ours_model.apply(variables, jnp.asarray(x), False)
    assert len(ours) == len(refs) == 5
    for i, (o, r) in enumerate(zip(ours, refs)):
        np.testing.assert_allclose(
            np.asarray(o), r, rtol=1e-4, atol=1e-4,
            err_msg=f"deep-supervision head d{i + 1} mismatch",
        )


def test_masks_match_pixel_for_pixel(ref_models):
    """The north-star statement: thresholded masks identical."""
    import torch

    from mdeical_image_segmentation_tpu.models import UNet
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet_params_from_torch,
    )

    torch.manual_seed(3)
    tm = ref_models[0](1, 1).eval()
    x = np.random.RandomState(3).rand(2, 96, 96, 1).astype(np.float32)
    with torch.no_grad():
        ref_logits = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    ref_mask = (1 / (1 + np.exp(-np.moveaxis(ref_logits, 1, -1)))) > 0.5

    ours_model = UNet(in_channels=1, out_channels=1)
    variables = unet_params_from_torch(_state_dict_np(tm))
    ours_logits = np.asarray(ours_model.apply(variables, jnp.asarray(x)))
    ours_mask = (1 / (1 + np.exp(-ours_logits))) > 0.5
    np.testing.assert_array_equal(ours_mask, ref_mask)


# ---------------------------------------------------------------------------
# 3D family parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_models_3d():
    """Import the reference 3D model zoo (its buildingblocks vendor-imports
    pytorch3dunet.unet3d.se, which we alias to the reference's own se.py)."""
    import importlib.machinery
    import importlib.util
    import types

    spec = importlib.util.spec_from_file_location(
        "ref_se", os.path.join(REFERENCE, "model/unet3d/se.py")
    )
    ref_se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_se)

    def _stub(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return mod

    _install_2d_stubs()
    pkg = _stub("pytorch3dunet")
    sub = _stub("pytorch3dunet.unet3d")
    se = _stub("pytorch3dunet.unet3d.se")
    se.ChannelSELayer3D = ref_se.ChannelSELayer3D
    se.SpatialSELayer3D = ref_se.SpatialSELayer3D
    se.ChannelSpatialSELayer3D = ref_se.ChannelSpatialSELayer3D
    sub.se = se
    pkg.unet3d = sub
    sys.modules.setdefault("pytorch3dunet", pkg)
    sys.modules.setdefault("pytorch3dunet.unet3d", sub)
    sys.modules.setdefault("pytorch3dunet.unet3d.se", se)

    sys.path.insert(0, REFERENCE)
    try:
        from model.unet3d.model import (  # noqa
            ResidualUNet3D as TorchResUNet3D,
            UNet3D as TorchUNet3D,
        )
    finally:
        sys.path.remove(REFERENCE)
    return TorchUNet3D, TorchResUNet3D


def test_unet3d_pixel_parity(ref_models_3d):
    import torch

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet3d_params_from_torch,
    )

    torch.manual_seed(4)
    tm = ref_models_3d[0](1, 2, f_maps=8, num_levels=3).eval()
    x = np.random.RandomState(4).rand(1, 16, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    ref = np.moveaxis(ref, 1, -1)

    ours_model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 2, "f_maps": 8,
         "num_levels": 3}
    )
    variables = unet3d_params_from_torch(
        _state_dict_np(tm), num_levels=3, layer_order="gcr",
        basic_module="DoubleConv",
    )
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_residual_unet3d_pixel_parity(ref_models_3d):
    import torch

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet3d_params_from_torch,
    )

    torch.manual_seed(5)
    tm = ref_models_3d[1](1, 1, f_maps=8, num_levels=3).eval()
    x = np.random.RandomState(5).rand(1, 16, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy())).numpy()
    ref = np.moveaxis(ref, 1, -1)

    ours_model = get_model(
        {"name": "ResidualUNet3D", "in_channels": 1, "out_channels": 1,
         "f_maps": 8, "num_levels": 3}
    )
    variables = unet3d_params_from_torch(
        _state_dict_np(tm), num_levels=3, layer_order="cge",
        basic_module="ResNetBlock",
    )
    ours = np.asarray(ours_model.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_cgm_pixel_parity(ref_models):
    """CGM variant: gated sigmoid outputs match the torch reference."""
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        from model.unet2d.unet import UNet_3Plus_DeepSup_CGM as TorchCGM
    finally:
        sys.path.remove(REFERENCE)

    from mdeical_image_segmentation_tpu.models import UNet3PlusDeepSupCGM
    from mdeical_image_segmentation_tpu.utils.torch_import import (
        unet3plus_params_from_torch,
    )

    torch.manual_seed(6)
    tm = TorchCGM(1, 1).eval()
    x = np.random.RandomState(6).rand(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        refs = [
            np.moveaxis(t.numpy(), 1, -1)
            for t in tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
        ]

    ours_model = UNet3PlusDeepSupCGM(in_channels=1, n_classes=1)
    variables = unet3plus_params_from_torch(
        _state_dict_np(tm), variant="UNet_3Plus_DeepSup_CGM"
    )
    ours = ours_model.apply(variables, jnp.asarray(x), False)
    for i, (o, r) in enumerate(zip(ours, refs)):
        np.testing.assert_allclose(
            np.asarray(o), r, rtol=1e-4, atol=1e-4,
            err_msg=f"CGM head d{i + 1} mismatch",
        )
