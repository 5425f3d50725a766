"""3D/2D conv block factory — the layer-order-string building blocks.

Reference: /root/reference/model/unet3d/buildingblocks.py.  The order string
('gcr', 'cbrd', …) composes a conv layer out of:

    c = conv (bias only when no norm in the order, buildingblocks.py:62)
    g = GroupNorm (groups clamp to 1 if channels < groups, :81-86; normalizes
        in- or out-channels depending on position relative to 'c')
    b = BatchNorm  r = ReLU  l = LeakyReLU  e = ELU
    d = Dropout    D = channel dropout (Dropout2d/3d)

Blocks: ``SingleConv`` (:117-160), ``DoubleConv`` (encoder halves channels on
conv1 unless upscale==1, :202-215), ``ResNetBlock`` (1×1 shortcut + 2
SingleConvs, post-add nonlinearity, :255-325), ``ResNetBlockSE`` (:328-362),
``Encoder`` = optional max/avg pool + block (:365-439), ``Decoder`` =
upsample + join + block where DoubleConv ⇒ nearest-interp + concat and
ResNet ⇒ deconv + summation with channel adaptation (:442-550), plus the
``create_encoders``/``create_decoders`` assembly rules (:553-639).

Everything channels-last ((N, D, H, W, C) when is3d, else (N, H, W, C)).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image import avg_pool_nd, interpolate_nearest_nd, max_pool_nd
from ..ops.norm import GroupNorm
from .layers2d import TorchConv
from .se3d import SE_MODULES

IntOrTuple = Union[int, Sequence[int]]


def _ktuple(k: IntOrTuple, nsp: int) -> Tuple[int, ...]:
    return (k,) * nsp if isinstance(k, int) else tuple(k)


class _GNParamHolder(nn.Module):
    """Owns GroupNorm's params without running it — the fused 'gcr' path
    (ops/fused_conv.py) needs the raw (scale, bias) but the param tree must
    stay byte-identical to the unfused ``GroupNorm_0`` scope."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class _ConvKernelLeaf(nn.Module):
    shape: Tuple[int, ...]
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape)


class _ConvParamHolder(nn.Module):
    """Mirrors ``TorchConv_0/Conv_0/kernel`` (no bias — norm orders)."""

    shape: Tuple[int, ...]
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        return _ConvKernelLeaf(self.shape, self.kernel_init, name="Conv_0")()


class SingleConv(nn.Module):
    """Order-string conv layer (reference SingleConv, buildingblocks.py:117-160)."""

    out_channels: int
    kernel_size: IntOrTuple = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: IntOrTuple = 1
    dropout_prob: float = 0.1
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        order = self.order
        assert "c" in order, "Conv layer MUST be present"
        assert order[0] not in "rle", (
            "Non-linearity cannot be the first operation in the layer"
        )
        nsp = 3 if self.is3d else 2
        ks = _ktuple(self.kernel_size, nsp)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * nsp
        else:
            pad = [(p, p) for p in pad]
        use_bias = not ("g" in order or "b" in order)

        # fused 'gcr' fast path (ops/fused_conv.py): GroupNorm-apply + conv
        # + ReLU in one Pallas kernel, the normalized tensor never touching
        # HBM.  Param tree (GroupNorm_0/{scale,bias},
        # TorchConv_0/Conv_0/kernel) is identical to the unfused path below,
        # so checkpoints/torch imports are unaffected.
        from ..ops import norm as _norm
        from ..ops import quant as _quant

        if (
            order == "gcr"
            and self.is3d
            and x.ndim == 5
            and ks == (3, 3, 3)
            and pad == [(1, 1)] * 3
            and _quant.mode() == "off"  # int8 PTQ routes via TorchConv
            # cross-shard GroupNorm psums its stats over the spatial mesh
            # axis inside ops.norm — the fused kernel computes local stats
            # only, so it must stand aside to keep mesh-width exactness
            and _norm._CROSS_SHARD_CTX is None
        ):
            from ..ops import fused_conv as _fc

            c_in = x.shape[-1]
            groups = 1 if c_in < self.num_groups else self.num_groups
            mode = (
                _fc.fused_gcr_mode(x.shape, x.dtype, c_in, self.out_channels)
                if c_in % groups == 0
                else None
            )
            if mode is not None:
                from flax.linen import dtypes as flax_dtypes

                from .layers2d import _resolve_kernel_init

                scale, bias = _GNParamHolder(c_in, name="GroupNorm_0")()
                kernel = _ConvParamHolder(
                    ks + (c_in, self.out_channels),
                    _resolve_kernel_init("torch_default"),
                    name="TorchConv_0",
                )()
                x, kernel = flax_dtypes.promote_dtype(
                    x, kernel, dtype=self.dtype
                )
                return _fc.gcr_fused_conv(
                    x, scale, bias, kernel, groups, 1e-5, mode
                )

        for i, char in enumerate(order):
            if char == "r":
                x = nn.relu(x)
            elif char == "l":
                x = nn.leaky_relu(x, negative_slope=0.01)
            elif char == "e":
                x = nn.elu(x)
            elif char == "c":
                x = TorchConv(
                    self.out_channels, ks, padding=pad, use_bias=use_bias,
                    dtype=self.dtype,
                )(x)
            elif char == "g":
                num_channels = x.shape[-1]
                groups = self.num_groups
                if num_channels < groups:
                    groups = 1
                assert num_channels % groups == 0, (
                    f"Expected number of channels in input to be divisible by "
                    f"num_groups. num_channels={num_channels}, num_groups={groups}"
                )
                # bandwidth-lean GroupNorm (ops/norm.py): identical math and
                # param paths to nn.GroupNorm, but bf16-native traffic with a
                # custom VJP — flax's promotes full tensors to fp32, which
                # profiled as ~60% of the 3D 'gcr' step on v5e.
                x = GroupNorm(
                    num_groups=groups, epsilon=1e-5, dtype=self.dtype
                )(x)
            elif char == "b":
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                )(x)
            elif char == "d":
                x = nn.Dropout(rate=self.dropout_prob, deterministic=not train)(x)
            elif char == "D":
                # channel dropout: zero whole feature maps (torch Dropout2d/3d)
                x = nn.Dropout(
                    rate=self.dropout_prob,
                    broadcast_dims=tuple(range(1, x.ndim - 1)),
                    deterministic=not train,
                )(x)
            else:
                raise ValueError(
                    f"Unsupported layer type '{char}'. MUST be one of "
                    f"['b', 'g', 'r', 'l', 'e', 'c', 'd', 'D']"
                )
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs; encoder halves channels on conv1 (unless upscale==1,
    never below in_channels) — reference buildingblocks.py:163-249."""

    out_channels: int
    encoder: bool
    kernel_size: IntOrTuple = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: IntOrTuple = 1
    upscale: int = 2
    dropout_prob: Union[float, Tuple[float, float]] = 0.1
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        if self.encoder:
            conv1_out = (
                self.out_channels if self.upscale == 1 else self.out_channels // 2
            )
            if conv1_out < in_channels:
                conv1_out = in_channels
        else:
            conv1_out = self.out_channels

        if isinstance(self.dropout_prob, (list, tuple)):
            p1, p2 = self.dropout_prob
        else:
            p1 = p2 = self.dropout_prob

        x = SingleConv(
            conv1_out, self.kernel_size, self.order, self.num_groups,
            self.padding, p1, self.is3d, self.dtype, name="SingleConv1",
        )(x, train)
        x = SingleConv(
            self.out_channels, self.kernel_size, self.order, self.num_groups,
            self.padding, p2, self.is3d, self.dtype, name="SingleConv2",
        )(x, train)
        return x


class ResNetBlock(nn.Module):
    """Residual block (1×1 shortcut if channels change, conv2 with full order,
    conv3 without nonlinearity, post-add nonlinearity) — reference
    buildingblocks.py:252-325."""

    out_channels: int
    kernel_size: IntOrTuple = 3
    order: str = "cge"
    num_groups: int = 8
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        nsp = 3 if self.is3d else 2
        if x.shape[-1] != self.out_channels:
            residual = TorchConv(
                self.out_channels, (1,) * nsp, dtype=self.dtype, name="conv1"
            )(x)
        else:
            residual = x

        out = SingleConv(
            self.out_channels, self.kernel_size, self.order, self.num_groups,
            is3d=self.is3d, dtype=self.dtype, name="conv2",
        )(residual, train)
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(
            self.out_channels, self.kernel_size, n_order, self.num_groups,
            is3d=self.is3d, dtype=self.dtype, name="conv3",
        )(out, train)

        out = out + residual
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


class ResNetBlockSE(nn.Module):
    """ResNetBlock + squeeze-excitation (reference buildingblocks.py:328-362)."""

    out_channels: int
    kernel_size: IntOrTuple = 3
    order: str = "cge"
    num_groups: int = 8
    se_module: str = "scse"
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.se_module in SE_MODULES
        out = ResNetBlock(
            self.out_channels, self.kernel_size, self.order, self.num_groups,
            self.is3d, self.dtype,
        )(x, train)
        return SE_MODULES[self.se_module](self.dtype)(out)


def _make_basic_module(
    basic_module: str,
    out_channels: int,
    *,
    encoder: bool,
    kernel_size: IntOrTuple,
    order: str,
    num_groups: int,
    padding: IntOrTuple,
    upscale: int,
    dropout_prob,
    is3d: bool,
    dtype,
    name: str,
):
    if basic_module == "DoubleConv":
        return DoubleConv(
            out_channels, encoder, kernel_size, order, num_groups, padding,
            upscale, dropout_prob, is3d, dtype, name=name,
        )
    if basic_module == "ResNetBlock":
        return ResNetBlock(
            out_channels, kernel_size, order, num_groups, is3d, dtype, name=name
        )
    if basic_module == "ResNetBlockSE":
        return ResNetBlockSE(
            out_channels, kernel_size, order, num_groups, "scse", is3d, dtype,
            name=name,
        )
    raise ValueError(f"Unsupported basic_module {basic_module!r}")


class Encoder(nn.Module):
    """Optional pooling + basic block (reference buildingblocks.py:365-439)."""

    out_channels: int
    conv_kernel_size: IntOrTuple = 3
    apply_pooling: bool = True
    pool_kernel_size: IntOrTuple = 2
    pool_type: str = "max"
    basic_module: str = "DoubleConv"
    conv_layer_order: str = "gcr"
    num_groups: int = 8
    padding: IntOrTuple = 1
    upscale: int = 2
    dropout_prob: Union[float, Tuple[float, float]] = 0.1
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.pool_type in ["max", "avg"]
        if self.apply_pooling:
            if self.pool_type == "max":
                x = max_pool_nd(x, self.pool_kernel_size)
            else:
                x = avg_pool_nd(x, self.pool_kernel_size)
        block = _make_basic_module(
            self.basic_module, self.out_channels,
            encoder=True, kernel_size=self.conv_kernel_size,
            order=self.conv_layer_order, num_groups=self.num_groups,
            padding=self.padding, upscale=self.upscale,
            dropout_prob=self.dropout_prob, is3d=self.is3d, dtype=self.dtype,
            name="basic_module",
        )
        return block(x, train)


class TransposeConvUpsampling(nn.Module):
    """ConvTranspose (k=conv_kernel, stride=scale, padding=1, no bias) + a
    nearest interpolation to the exact skip size — reference
    buildingblocks.py:674-729 (the interpolate works around odd-size outputs)."""

    out_channels: int
    kernel_size: IntOrTuple = 3
    scale_factor: IntOrTuple = 2
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, output_size: Sequence[int]) -> jax.Array:
        from ..ops.conv3d import SlabConvTranspose3D, use_slab_transpose

        nsp = 3 if self.is3d else 2
        ks = _ktuple(self.kernel_size, nsp)
        strides = _ktuple(self.scale_factor, nsp)
        pad = tuple((k - 1 - 1,) * 2 for k in ks)  # torch padding=1
        from ..ops import initializers as tinit

        # torch ConvTranspose default (kaiming uniform a=sqrt(5)) — with the
        # DECONV fan: torch counts out_channels*prod(k) (weight dim 1), not
        # the flax variance_scaling 'fan_in' of in_channels*prod(k)
        kinit = tinit.torch_conv_default_kernel(transpose=True)
        from ..ops.remat import tag_conv_out

        if use_slab_transpose(ks, strides):
            # depth-axis hand-lowering of the 3D deconv (ops/conv3d.py):
            # same params/name as nn.ConvTranspose, ~identical math, but
            # rides XLA's 2D conv path on TPU instead of the slow native
            # 3D deconv lowering
            x = SlabConvTranspose3D(
                features=self.out_channels, kernel_size=ks, strides=strides,
                padding=pad, use_bias=False, kernel_init=kinit,
                dtype=self.dtype, name="ConvTranspose_0",
            )(x)
        else:
            x = nn.ConvTranspose(
                features=self.out_channels,
                kernel_size=ks,
                strides=strides,
                padding=pad,
                use_bias=False,
                kernel_init=kinit,
                dtype=self.dtype,
            )(x)
        return interpolate_nearest_nd(tag_conv_out(x), output_size)


class Decoder(nn.Module):
    """Upsample + join + basic block (reference buildingblocks.py:442-550).

    Defaults ('default' upsample): DoubleConv ⇒ nearest interpolation + concat
    join; ResNetBlock[SE] ⇒ deconv + summation join with channel adaptation.
    """

    out_channels: int
    conv_kernel_size: IntOrTuple = 3
    scale_factor: IntOrTuple = 2
    basic_module: str = "DoubleConv"
    conv_layer_order: str = "gcr"
    num_groups: int = 8
    padding: IntOrTuple = 1
    upsample: Optional[str] = "default"
    dropout_prob: Union[float, Tuple[float, float]] = 0.1
    is3d: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, encoder_features: jax.Array, x: jax.Array, train: bool = False
    ) -> jax.Array:
        upsample = self.upsample
        concat = True
        adapt_channels = False
        output_size = encoder_features.shape[1:-1]

        if upsample is not None and upsample != "none":
            if upsample == "default":
                if self.basic_module == "DoubleConv":
                    upsample, concat, adapt_channels = "nearest", True, False
                else:
                    upsample, concat, adapt_channels = "deconv", False, True
            if upsample == "deconv":
                x = TransposeConvUpsampling(
                    self.out_channels, self.conv_kernel_size, self.scale_factor,
                    self.is3d, self.dtype, name="upsampling",
                )(x, output_size)
            else:
                # InterpolateUpsampling; nearest is the only mode used by the
                # model zoo — other torch modes map to resize_bilinear.
                if upsample == "nearest":
                    x = interpolate_nearest_nd(x, output_size)
                else:
                    from ..ops.image import resize_bilinear

                    x = resize_bilinear(x, output_size)
        # else NoUpsampling: x unchanged, concat join

        del adapt_channels  # channel adaptation is implicit in channels-last convs
        if concat:
            x = jnp.concatenate([encoder_features, x], axis=-1)
        else:
            x = encoder_features + x

        block = _make_basic_module(
            self.basic_module, self.out_channels,
            encoder=False, kernel_size=self.conv_kernel_size,
            order=self.conv_layer_order, num_groups=self.num_groups,
            padding=self.padding, upscale=2, dropout_prob=self.dropout_prob,
            is3d=self.is3d, dtype=self.dtype, name="basic_module",
        )
        return block(x, train)
