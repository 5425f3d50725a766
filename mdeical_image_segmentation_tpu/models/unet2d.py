"""2D segmentation models (Flax, NHWC): UNet, UNet-3+ family.

TPU-native re-design of /root/reference/model/unet2d/unet.py:

- ``UNet`` — classic 4-level encoder/decoder, 64→1024 features, DoubleConv +
  maxpool down, ConvTranspose k2s2 up, center-crop skip concat, 1×1 head
  (reference unet.py:42-128).
- ``UNet3Plus`` — 5-level encoder with full-scale skip connections: every
  decoder stage fuses all 5 scales (maxpooled shallow encoders, the same-scale
  encoder, bilinearly upsampled deeper decoder stages/bottleneck), each via a
  conv3x3+BN+ReLU to 64 channels, concatenated to 320 and fused
  (reference unet.py:136-446).
- ``UNet3PlusDeepSup`` — + 5 deep-supervision heads, each bilinearly upsampled
  to full resolution; returns a 5-tuple of logits (reference unet.py:454-787).
- ``UNet3PlusDeepSupCGM`` — + classification-guided module on the bottleneck
  gating all 5 sigmoid outputs (reference unet.py:795-1153; note the reference
  returns *probabilities* for this variant — parity preserved).

The decoder fan-in is expressed as loops over scales rather than 60 named
submodules; weights are kaiming-initialized exactly like the reference
(conv kaiming-normal fan_in, BN scale ~ N(1, 0.02²)).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import max_pool2d, upsample_bilinear2d
from ..ops.remat import resolve_policy
from .layers2d import (
    ConvBNReLU,
    DoubleConvolution,
    TorchConv,
    UNetConv2,
    UpSample,
    crop_and_concat,
)

FILTERS = (64, 128, 256, 512, 1024)


class UNet(nn.Module):
    """Classic U-Net (reference unet.py:42-128).

    ``base_features`` scales the whole channel progression (64 in the
    reference); smaller values give the fast benchmark variants.
    """

    in_channels: int = 3
    out_channels: int = 1
    base_features: int = 64
    dtype: Optional[Any] = None
    # rematerialize each DoubleConvolution in the backward pass: at narrow
    # widths the train step is HBM-bandwidth-bound with the MXU ~93% idle
    # (PERF.md base8 roofline), so recomputing the conv pair instead of
    # stashing its intermediates trades idle FLOPs for activation traffic
    remat: bool = False
    # checkpoint policy under remat (ops/remat.py): 'save_convs' keeps the
    # tagged conv outputs and recomputes only the elementwise tail — the
    # remat sweep's root cause (conv recompute re-reads full-res HBM inputs)
    # says whole-block recompute is the expensive part
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train  # no BN/dropout in the classic UNet
        f = self.base_features
        downs = (f, 2 * f, 4 * f, 8 * f)
        dc_cls = (
            nn.remat(DoubleConvolution, policy=resolve_policy(self.remat_policy))
            if self.remat else DoubleConvolution
        )
        n_dc = 0

        def dc(feats, x):
            # explicit names keep the params tree identical with/without
            # remat (nn.remat changes auto-generated module names)
            nonlocal n_dc
            y = dc_cls(
                feats, dtype=self.dtype, name=f"DoubleConvolution_{n_dc}"
            )(x)
            n_dc += 1
            return y

        skips = []
        for feats in downs:
            x = dc(feats, x)
            skips.append(x)
            x = max_pool2d(x, 2)

        x = dc(16 * f, x)

        for feats in reversed(downs):
            x = UpSample(feats, dtype=self.dtype)(x)
            x = crop_and_concat(x, skips.pop())
            x = dc(feats, x)

        return TorchConv(self.out_channels, (1, 1), dtype=self.dtype)(x)


class _UNet3PlusBackbone(nn.Module):
    """Shared encoder + full-scale-skip decoder of the UNet-3+ family.

    Returns (hd1..hd4 decoder maps, hd5 bottleneck).  Channel bookkeeping:
    cat_channels = filters[0], 5 fused sources → up_channels = 5*filters[0]
    (reference unet.py:168-171).
    """

    in_channels: int = 3
    is_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None
    remat: bool = False  # rematerialize blocks (memory + compile-size lever)
    remat_policy: Optional[str] = None  # see ops/remat.py

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        filters = FILTERS
        cat_ch = filters[0]
        up_ch = cat_ch * 5
        if self.remat:
            # `train` is python control flow inside the blocks → static
            policy = resolve_policy(self.remat_policy)
            conv_cls = nn.remat(UNetConv2, static_argnums=(2,), policy=policy)
            cbr_cls = nn.remat(ConvBNReLU, static_argnums=(2,), policy=policy)
        else:
            conv_cls, cbr_cls = UNetConv2, ConvBNReLU

        # ---- Encoder: conv, then maxpool between levels -------------------
        # explicit names keep the params tree identical with/without remat
        # (nn.remat changes auto-generated module names)
        enc = {}
        for lvl, feats in enumerate(filters, start=1):
            if lvl > 1:
                x = max_pool2d(x, 2)
            x = conv_cls(
                feats, is_batchnorm=self.is_batchnorm,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"UNetConv2_{lvl - 1}",
            )(x, train)
            enc[lvl] = x
        hd = {5: enc[5]}  # hd5 is the bottleneck

        # ---- Decoder stages 4d..1d ---------------------------------------
        # Stage t fuses: encoder levels 1..t (maxpool 2^(t-l), ceil_mode) and
        # decoder levels t+1..5 (bilinear ×2^(l-t), align_corners=False), each
        # through conv3x3+BN+ReLU to cat_ch, concatenated shallow→deep
        # (reference unet.py:173-333 construction, 335-446 forward).
        cbr_idx = 0
        for t in (4, 3, 2, 1):
            branches = []
            for lvl in range(1, 6):
                if lvl < t:
                    src = max_pool2d(enc[lvl], 2 ** (t - lvl), ceil_mode=True)
                elif lvl == t:
                    src = enc[lvl]
                else:
                    src = upsample_bilinear2d(
                        hd[lvl], 2 ** (lvl - t), align_corners=False
                    )
                branches.append(
                    cbr_cls(
                        cat_ch, bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                        name=f"ConvBNReLU_{cbr_idx}",
                    )(src, train)
                )
                cbr_idx += 1
            fused = jnp.concatenate(branches, axis=-1)
            hd[t] = cbr_cls(
                up_ch, bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"ConvBNReLU_{cbr_idx}",
            )(fused, train)
            cbr_idx += 1

        return hd


class UNet3Plus(nn.Module):
    """UNet-3+ (reference unet.py:136-446): single 3×3 output head on hd1."""

    in_channels: int = 3
    n_classes: int = 1
    feature_scale: int = 4  # kept for config parity; unused (as in reference)
    is_deconv: bool = True
    is_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None
    remat: bool = False
    remat_policy: Optional[str] = None  # see ops/remat.py

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hd = _UNet3PlusBackbone(
            self.in_channels, self.is_batchnorm, self.bn_axis_name, self.dtype,
            self.remat, self.remat_policy,
        )(x, train)
        return TorchConv(
            self.n_classes, (3, 3), kernel_init="kaiming", dtype=self.dtype
        )(hd[1])


class UNet3PlusDeepSup(nn.Module):
    """UNet-3+ with deep supervision (reference unet.py:454-787).

    Returns a 5-tuple (d1..d5) of full-resolution logits: dI is a 3×3 head on
    hd_I, bilinearly upsampled ×2^(I-1) (align_corners=False).
    """

    in_channels: int = 3
    n_classes: int = 1
    feature_scale: int = 4
    is_deconv: bool = True
    is_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None
    remat: bool = False
    remat_policy: Optional[str] = None  # see ops/remat.py

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        hd = _UNet3PlusBackbone(
            self.in_channels, self.is_batchnorm, self.bn_axis_name, self.dtype,
            self.remat, self.remat_policy,
        )(x, train)
        outs = []
        for i in range(1, 6):
            d = TorchConv(
                self.n_classes, (3, 3), kernel_init="kaiming",
                dtype=self.dtype, name=f"outconv{i}",
            )(hd[i])
            if i > 1:
                d = upsample_bilinear2d(d, 2 ** (i - 1), align_corners=False)
            outs.append(d)
        return tuple(outs)


class UNet3PlusDeepSupCGM(nn.Module):
    """UNet-3+ with deep supervision + classification-guided module
    (reference unet.py:795-1153).

    The CGM branch (dropout 0.5 → 1×1 conv to 2 → global max-pool → sigmoid →
    argmax) produces a per-sample binary gate multiplied into every output.
    Parity quirk preserved: this variant returns *sigmoid probabilities*, not
    logits (reference unet.py:1152).
    """

    in_channels: int = 3
    n_classes: int = 1
    feature_scale: int = 4
    is_deconv: bool = True
    is_batchnorm: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None
    remat: bool = False
    remat_policy: Optional[str] = None  # see ops/remat.py

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, ...]:
        hd = _UNet3PlusBackbone(
            self.in_channels, self.is_batchnorm, self.bn_axis_name, self.dtype,
            self.remat, self.remat_policy,
        )(x, train)

        # Classification branch on the bottleneck.
        cls = nn.Dropout(rate=0.5, deterministic=not train)(hd[5])
        cls = TorchConv(2, (1, 1), kernel_init="kaiming", dtype=self.dtype)(cls)
        cls = jnp.max(cls, axis=(1, 2))  # AdaptiveMaxPool2d(1) → (B, 2)
        cls = jax.nn.sigmoid(cls)
        # argmax → float gate; `stop_gradient` mirrors torch argmax having no
        # gradient.  (B,) broadcast over (B, H, W, C) = reference dotProduct
        # with its (B, 1) class column (unet.py:1012-1017).
        gate = jax.lax.stop_gradient(
            jnp.argmax(cls, axis=1).astype(hd[5].dtype)
        )[:, None, None, None]

        outs = []
        for i in range(1, 6):
            d = TorchConv(
                self.n_classes, (3, 3), kernel_init="kaiming",
                dtype=self.dtype, name=f"outconv{i}",
            )(hd[i])
            if i > 1:
                d = upsample_bilinear2d(d, 2 ** (i - 1), align_corners=False)
            outs.append(jax.nn.sigmoid(d * gate))
        return tuple(outs)
