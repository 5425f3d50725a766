"""2D layer library (Flax, NHWC) — the building blocks of the 2D model family.

TPU-native re-design of the reference's layer zoo
(/root/reference/model/unet2d/layers.py):

- ``TorchConv`` / ``TorchConvTranspose`` — thin Flax conv wrappers that carry
  torch-parity initialization (default kaiming-uniform(a=sqrt(5)) weight +
  U(±1/sqrt(fan_in)) bias, or the ``init_weights`` schemes by name).
- ``UNetConv2`` — n × (conv3x3 [+ BN] + ReLU), reference layers.py:8-46.
- ``DoubleConvolution`` — 2 × (conv3x3 + ReLU), torch-default init,
  reference layers.py:103-133.
- ``UpSample`` — ConvTranspose k2 s2, reference layers.py:153-168.
- ``UNetUp`` — deconv k4 s2 p1 (or ×2 bilinear align_corners=True) + concat +
  UNetConv2 without BN, reference layers.py:49-75.
- ``crop_and_concat`` — center-crop skip + concat, reference layers.py:171-192.

All convs are channels-last; BatchNorm matches torch defaults (eps 1e-5,
momentum 0.1 ⇒ flax momentum 0.9) and optionally syncs batch statistics
across a named mesh axis (``bn_axis_name``) — the TPU-idiomatic upgrade over
per-replica DataParallel BN, off by default for reference parity.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv3d
from ..ops import initializers as tinit
from ..ops import quant as _quant
from ..ops.image import center_crop, upsample_bilinear2d
from ..ops.remat import tag_conv_out, tag_norm_out

KernelInit = Union[str, Callable]


def _resolve_kernel_init(kernel_init: KernelInit, transpose: bool = False):
    if callable(kernel_init):
        return kernel_init
    if kernel_init == "torch_default":
        return tinit.torch_conv_default_kernel(transpose=transpose)
    return tinit.conv_kernel_init(kernel_init, transpose=transpose)


class TorchConv(nn.Module):
    """NHWC conv with torch-parity init. ``kernel_init`` is 'torch_default',
    one of the init_weights schemes ('normal'/'xavier'/'kaiming'/'orthogonal'),
    or an explicit initializer.  Bias always follows torch's conv default
    (init_weights never touches conv biases, init_weights.py:5-64)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Optional[Sequence[int]] = None  # None → all-ones, any rank
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: KernelInit = "torch_default"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = tuple(self.kernel_size)
        strides = tuple(self.strides) if self.strides else (1,) * len(ks)
        fan_in = math.prod(ks) * x.shape[-1]
        if _quant.mode() != "off" and _quant.quantizable(ks, x.shape[-1]):
            # int8 PTQ inference path (ops/quant.py): same param tree
            # ("Conv_0/{kernel,bias}"), s8×s8→s32 conv on the MXU.
            return tag_conv_out(_quant.Int8Conv(
                features=self.features,
                kernel_size=ks,
                strides=strides,
                padding=self.padding,
                use_bias=self.use_bias,
                kernel_init=_resolve_kernel_init(self.kernel_init),
                bias_init=tinit.torch_conv_default_bias(fan_in),
                dtype=self.dtype,
                name="Conv_0",
            )(x))
        if conv3d.use_slab(ks, strides):
            # TPU: lower the depth axis by hand onto XLA's 2D conv path
            # (~2x on v5e — ops/conv3d.py). name="Conv_0" keeps the param
            # tree identical to the nn.Conv branch below.
            return tag_conv_out(conv3d.SlabConv3D(
                features=self.features,
                kernel_size=ks,
                padding=self.padding,
                use_bias=self.use_bias,
                kernel_init=_resolve_kernel_init(self.kernel_init),
                bias_init=tinit.torch_conv_default_bias(fan_in),
                dtype=self.dtype,
                name="Conv_0",
            )(x))
        return tag_conv_out(nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=_resolve_kernel_init(self.kernel_init),
            bias_init=tinit.torch_conv_default_bias(fan_in),
            dtype=self.dtype,
        )(x))


class TorchConvTranspose(nn.Module):
    """NHWC transposed conv matching ``nn.ConvTranspose2d(k, s, p)``.

    The torch geometry is reproduced with input dilation = s and explicit
    padding (k - 1 - p) per side, so e.g. k4 s2 p1 and k2 s2 p0 both give
    exactly 2x upsampling."""

    features: int
    kernel_size: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    torch_padding: int = 0
    kernel_init: KernelInit = "torch_default"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = tuple(self.kernel_size)
        # torch ConvTranspose fan_in (for default init) = out_channels * prod(k)
        # because the weight layout is (in, out, kH, kW) and torch counts dim-1
        # — transpose=True makes the kernel init count the same fan.
        fan_in = math.prod(ks) * self.features
        pad = tuple((k - 1 - self.torch_padding,) * 2 for k in ks)
        return tag_conv_out(nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=tuple(self.strides),
            padding=pad,
            kernel_init=_resolve_kernel_init(self.kernel_init, transpose=True),
            bias_init=tinit.torch_conv_default_bias(fan_in),
            dtype=self.dtype,
        )(x))


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults; scale init per the reference's
    init_weights BatchNorm branch when ``init_type`` is set."""

    init_type: Optional[str] = None  # None => torch default (scale=1)
    axis_name: Optional[str] = None  # sync-BN across a mesh axis if set
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        scale_init = (
            tinit.norm_scale_002() if self.init_type else nn.initializers.ones
        )
        return tag_norm_out(nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=scale_init,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x))


class ConvBNReLU(nn.Module):
    """conv3x3 + BN + ReLU — the h*_conv/_bn/_relu triple of UNet-3+
    (reference model/unet2d/unet.py:176-178 et passim)."""

    features: int
    kernel_init: KernelInit = "kaiming"
    bn_init_type: Optional[str] = "kaiming"
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = TorchConv(
            self.features, (3, 3), kernel_init=self.kernel_init, dtype=self.dtype
        )(x)
        x = TorchBatchNorm(
            init_type=self.bn_init_type, axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(x, train)
        return nn.relu(x)


class UNetConv2(nn.Module):
    """n × (conv [+ BN] + ReLU); reference ``unetConv2`` (layers.py:8-46),
    kaiming-initialized."""

    features: int
    is_batchnorm: bool = True
    n: int = 2
    kernel_size: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(self.n):
            x = TorchConv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_init="kaiming",
                dtype=self.dtype,
            )(x)
            if self.is_batchnorm:
                x = TorchBatchNorm(
                    init_type="kaiming", axis_name=self.bn_axis_name,
                    dtype=self.dtype,
                )(x, train)
            x = nn.relu(x)
        return x


class _ConvKBLeaf(nn.Module):
    shape: Tuple[int, ...]
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = self.param("bias", self.bias_init, (self.shape[-1],))
        return k, b


class _ConvKBHolder(nn.Module):
    """Owns ``Conv_0/{kernel,bias}`` without running the conv — the fused
    DoubleConv path needs the raw params but the tree must stay identical
    to the ``TorchConv_k`` scopes of the unfused path."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        fan_in = math.prod(self.shape[:-1])
        return _ConvKBLeaf(
            self.shape,
            _resolve_kernel_init("torch_default"),
            tinit.torch_conv_default_bias(fan_in),
            name="Conv_0",
        )()


class DoubleConvolution(nn.Module):
    """2 × (conv3x3 + ReLU), torch-default init (classic UNet never calls
    init_weights on these); reference layers.py:103-133.

    On TPU (when the plane fits VMEM) the pair runs as ONE Pallas kernel
    (ops/fused_conv.py ``double_conv2d``) with the intermediate activation
    resident in VMEM between the convs — param tree unchanged."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from flax.linen import dtypes as flax_dtypes

        from ..ops import fused_conv as _fc
        from ..ops import quant as _quant

        ci = x.shape[-1]
        cdtype = self.dtype or x.dtype
        # int8 PTQ calibrates/quantizes through TorchConv — the fused float
        # kernel would silently bypass it, so it only engages with quant off.
        mode = (
            _fc.fused_double2d_mode(
                x.shape, cdtype, ci, self.features, self.features
            )
            if _quant.mode() == "off"
            else None
        )
        if mode is not None:
            w1, b1 = _ConvKBHolder(
                (3, 3, ci, self.features), name="TorchConv_0")()
            w2, b2 = _ConvKBHolder(
                (3, 3, self.features, self.features), name="TorchConv_1")()
            x, w1, b1, w2, b2 = flax_dtypes.promote_dtype(
                x, w1, b1, w2, b2, dtype=self.dtype
            )
            return _fc.double_conv2d(x, w1, b1, w2, b2, mode)
        x = nn.relu(TorchConv(self.features, (3, 3), dtype=self.dtype)(x))
        x = nn.relu(TorchConv(self.features, (3, 3), dtype=self.dtype)(x))
        return x


class UpSample(nn.Module):
    """ConvTranspose k2 s2 (classic UNet expansive path);
    reference layers.py:153-168."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return TorchConvTranspose(
            self.features, (2, 2), (2, 2), torch_padding=0, dtype=self.dtype
        )(x)


def crop_and_concat(x: jax.Array, contracting_x: jax.Array) -> jax.Array:
    """Center-crop the skip to x's spatial size, concat on channels;
    reference ``CropAndConcat`` (layers.py:171-192)."""
    skip = center_crop(contracting_x, x.shape[1:-1])
    return jnp.concatenate([x, skip], axis=-1)


class UNetUp(nn.Module):
    """Upsample (deconv k4 s2 p1 kaiming-init, or ×2 bilinear
    align_corners=True) + concat skips + UNetConv2(no BN);
    reference ``unetUp`` (layers.py:49-75)."""

    features: int
    is_deconv: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, *skips: jax.Array) -> jax.Array:
        if self.is_deconv:
            x = TorchConvTranspose(
                self.features, (4, 4), (2, 2), torch_padding=1,
                kernel_init="kaiming", dtype=self.dtype,
            )(x)
        else:
            x = upsample_bilinear2d(x, 2, align_corners=True)
        for s in skips:
            x = jnp.concatenate([x, s], axis=-1)
        return UNetConv2(self.features, is_batchnorm=False, dtype=self.dtype)(x)


class UNetUpOrigin(nn.Module):
    """The nested-UNet up block variant: same upsample choices but the conv
    consumes ``in_size + (n_concat - 2) * out_size`` channels (reference
    ``unetUp_origin``, layers.py:78-101).  In channels-last flax the conv
    input width follows the concat automatically; the module exists for
    architecture-parity with configs that reference it."""

    features: int
    is_deconv: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, *skips: jax.Array) -> jax.Array:
        if self.is_deconv:
            x = TorchConvTranspose(
                self.features, (4, 4), (2, 2), torch_padding=1,
                kernel_init="kaiming", dtype=self.dtype,
            )(x)
        else:
            x = upsample_bilinear2d(x, 2, align_corners=True)
        for s in skips:
            x = jnp.concatenate([x, s], axis=-1)
        return UNetConv2(self.features, is_batchnorm=False, dtype=self.dtype)(x)
