"""Torch checkpoint migration: convert reference state_dicts to our params.

A user of the reference trains torch models (model/unet2d/unet.py); this
module lets them bring those weights to the TPU framework:

    variables = unet_params_from_torch(state_dict, out_channels=1)
    variables = unet3plus_params_from_torch(state_dict)  # (+ DeepSup/CGM)

State dicts are plain ``{name: numpy array}`` mappings (torch tensors are
accepted and converted).  Layout conversions:

- Conv2d weight (O, I, kh, kw) → flax HWIO (kh, kw, I, O);
- ConvTranspose2d weight (I, O, kh, kw) → flax ConvTranspose kernel with the
  spatial taps flipped (torch transposed conv scatters the kernel, flax
  computes a fractionally-strided cross-correlation — flipping reconciles
  them);
- BatchNorm weight/bias → scale/bias params, running_mean/var → batch_stats.

These converters also power the pixel-parity golden tests
(tests/test_torch_parity.py): outputs of the converted models match the
torch reference at fp32 tolerance.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def convert_conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch Conv2d/3d → flax Conv params (wrapped under our TorchConv)."""
    out = {"kernel": np.moveaxis(_np(sd[f"{prefix}.weight"]), (0, 1), (-1, -2))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def convert_conv_transpose(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d/3d → flax ConvTranspose params.

    torch weight layout is (I, O, *k) and the op scatters the kernel;
    flax's conv_transpose cross-correlates — flip the spatial taps and move
    (I, O) to the trailing axes.
    """
    w = _np(sd[f"{prefix}.weight"])
    spatial_axes = tuple(range(2, w.ndim))
    w = np.flip(w, axis=spatial_axes)
    w = np.moveaxis(w, (0, 1), (-2, -1))  # (*k, I, O)
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def convert_bn(sd: Mapping[str, Any], prefix: str):
    """torch BatchNorm → (params {scale, bias}, stats {mean, var})."""
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _tc(conv):  # our TorchConv wraps an inner nn.Conv named Conv_0
    return {"Conv_0": conv}


def _tct(conv):  # TorchConvTranspose wraps ConvTranspose_0
    return {"ConvTranspose_0": conv}


def unet_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Classic UNet (reference unet.py:42-128) → our UNet variables.

    torch module paths: down_conv.{i}.first/second, middle_conv,
    up_sample.{i}.up, up_conv.{i}.first/second, final_conv.
    Our module order: DoubleConvolution_0..3 (down), _4 (middle), then per
    decoder level UpSample_i + DoubleConvolution_{5+i}, final TorchConv_0.
    """
    params: Dict[str, Any] = {}
    for i in range(4):
        params[f"DoubleConvolution_{i}"] = {
            "TorchConv_0": _tc(convert_conv(sd, f"down_conv.{i}.first")),
            "TorchConv_1": _tc(convert_conv(sd, f"down_conv.{i}.second")),
        }
    params["DoubleConvolution_4"] = {
        "TorchConv_0": _tc(convert_conv(sd, "middle_conv.first")),
        "TorchConv_1": _tc(convert_conv(sd, "middle_conv.second")),
    }
    for i in range(4):
        params[f"UpSample_{i}"] = {
            "TorchConvTranspose_0": _tct(convert_conv_transpose(sd, f"up_sample.{i}.up"))
        }
        params[f"DoubleConvolution_{5 + i}"] = {
            "TorchConv_0": _tc(convert_conv(sd, f"up_conv.{i}.first")),
            "TorchConv_1": _tc(convert_conv(sd, f"up_conv.{i}.second")),
        }
    params["TorchConv_0"] = _tc(convert_conv(sd, "final_conv"))
    return {"params": params}


# UNet-3+ source names per decoder stage, in our branch order (levels 1..5
# then the fusion block) — reference unet.py:173-333.
_STAGE_SOURCES = {
    4: ["h1_PT_hd4", "h2_PT_hd4", "h3_PT_hd4", "h4_Cat_hd4", "hd5_UT_hd4"],
    3: ["h1_PT_hd3", "h2_PT_hd3", "h3_Cat_hd3", "hd4_UT_hd3", "hd5_UT_hd3"],
    2: ["h1_PT_hd2", "h2_Cat_hd2", "hd3_UT_hd2", "hd4_UT_hd2", "hd5_UT_hd2"],
    1: ["h1_Cat_hd1", "hd2_UT_hd1", "hd3_UT_hd1", "hd4_UT_hd1", "hd5_UT_hd1"],
}
_STAGE_FUSION = {4: "4d_1", 3: "3d_1", 2: "2d_1", 1: "1d_1"}


def _convbnrelu(sd, conv_name, bn_name):
    conv = _tc(convert_conv(sd, conv_name))
    bn_params, bn_stats = convert_bn(sd, bn_name)
    return (
        {"TorchConv_0": conv, "TorchBatchNorm_0": {"BatchNorm_0": bn_params}},
        {"TorchBatchNorm_0": {"BatchNorm_0": bn_stats}},
    )


def unet3plus_params_from_torch(
    sd: Mapping[str, Any], variant: str = "UNet_3Plus"
) -> Dict[str, Any]:
    """UNet-3+ family (reference unet.py:136-1153) → our variables.

    ``variant``: UNet_3Plus | UNet_3Plus_DeepSup | UNet_3Plus_DeepSup_CGM.
    """
    bb_params: Dict[str, Any] = {}
    bb_stats: Dict[str, Any] = {}

    # Encoder: conv1..conv5 (unetConv2 with Sequential conv1/conv2:
    # torch names convK.convI.{0: Conv2d, 1: BatchNorm2d}).
    for lvl in range(1, 6):
        uc_params: Dict[str, Any] = {}
        uc_stats: Dict[str, Any] = {}
        for j in range(2):
            uc_params[f"TorchConv_{j}"] = _tc(
                convert_conv(sd, f"conv{lvl}.conv{j + 1}.0")
            )
            bnp, bns = convert_bn(sd, f"conv{lvl}.conv{j + 1}.1")
            uc_params[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": bnp}
            uc_stats[f"TorchBatchNorm_{j}"] = {"BatchNorm_0": bns}
        bb_params[f"UNetConv2_{lvl - 1}"] = uc_params
        bb_stats[f"UNetConv2_{lvl - 1}"] = uc_stats

    # Decoder: 4 stages × (5 branches + 1 fusion) = 24 ConvBNReLU modules in
    # creation order t = 4, 3, 2, 1.
    idx = 0
    for t in (4, 3, 2, 1):
        for src in _STAGE_SOURCES[t]:
            p, s = _convbnrelu(sd, f"{src}_conv", f"{src}_bn")
            bb_params[f"ConvBNReLU_{idx}"] = p
            bb_stats[f"ConvBNReLU_{idx}"] = s
            idx += 1
        fusion = _STAGE_FUSION[t]
        p, s = _convbnrelu(sd, f"conv{fusion}", f"bn{fusion}")
        bb_params[f"ConvBNReLU_{idx}"] = p
        bb_stats[f"ConvBNReLU_{idx}"] = s
        idx += 1

    params: Dict[str, Any] = {"_UNet3PlusBackbone_0": bb_params}
    stats: Dict[str, Any] = {"_UNet3PlusBackbone_0": bb_stats}

    if variant == "UNet_3Plus":
        params["TorchConv_0"] = _tc(convert_conv(sd, "outconv1"))
    else:
        for i in range(1, 6):
            params[f"outconv{i}"] = _tc(convert_conv(sd, f"outconv{i}"))
        if variant == "UNet_3Plus_DeepSup_CGM":
            # cls = Sequential(Dropout, Conv2d, AdaptiveMaxPool2d, Sigmoid)
            params["TorchConv_0"] = _tc(convert_conv(sd, "cls.1"))
    return {"params": params, "batch_stats": stats}


def convert_groupnorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _single_conv_from_torch(sd: Mapping[str, Any], prefix: str, order: str):
    """Map one torch SingleConv (order-string layer) to our SingleConv tree.

    Our flax module numbers submodules in order-string sequence: GroupNorm_k
    for the k-th 'g', TorchConv_k for the k-th 'c' (flax auto-naming counts
    per-type).  The torch side names them 'groupnorm' / 'conv'.
    """
    out: Dict[str, Any] = {}
    if "g" in order:
        out["GroupNorm_0"] = convert_groupnorm(sd, f"{prefix}.groupnorm")
    out["TorchConv_0"] = _tc(convert_conv(sd, f"{prefix}.conv"))
    return out


def unet3d_params_from_torch(
    sd: Mapping[str, Any],
    *,
    num_levels: int = 4,
    layer_order: str = "gcr",
    basic_module: str = "DoubleConv",
) -> Dict[str, Any]:
    """3D family (reference model/unet3d/model.py) → our AbstractUNet params.

    Supports DoubleConv models (UNet3D/UNet2D) and ResNetBlock models
    (ResidualUNet3D/ResidualUNet2D); SE variants add the SE submodules.
    """
    params: Dict[str, Any] = {}

    def block(prefix: str) -> Dict[str, Any]:
        if basic_module == "DoubleConv":
            return {
                "SingleConv1": _single_conv_from_torch(
                    sd, f"{prefix}.SingleConv1", layer_order
                ),
                "SingleConv2": _single_conv_from_torch(
                    sd, f"{prefix}.SingleConv2", layer_order
                ),
            }
        # ResNetBlock: conv1 (1x1, only when channels change), conv2 full
        # order, conv3 without nonlinearity.
        out: Dict[str, Any] = {}
        if f"{prefix}.conv1.weight" in sd:
            out["conv1"] = _tc(convert_conv(sd, f"{prefix}.conv1"))
        out["conv2"] = _single_conv_from_torch(sd, f"{prefix}.conv2", layer_order)
        n_order = layer_order
        for ch in "rel":
            n_order = n_order.replace(ch, "")
        out["conv3"] = _single_conv_from_torch(sd, f"{prefix}.conv3", n_order)
        return out

    for i in range(num_levels):
        params[f"encoder{i}"] = {
            "basic_module": block(f"encoders.{i}.basic_module")
        }
    for i in range(num_levels - 1):
        dec: Dict[str, Any] = {
            "basic_module": block(f"decoders.{i}.basic_module")
        }
        up_prefix = f"decoders.{i}.upsampling.upsample.conv_transposed"
        if f"{up_prefix}.weight" in sd:
            dec["upsampling"] = _tct(convert_conv_transpose(sd, up_prefix))
        params[f"decoder{i}"] = dec
    params["final_conv"] = _tc(convert_conv(sd, "final_conv"))
    return {"params": params}
