"""3D U-Net family (Flax, channels-last): UNet3D / ResidualUNet3D /
ResidualUNetSE3D / UNet2D / ResidualUNet2D + the name registry.

Reference: /root/reference/model/unet3d/model.py.  ``AbstractUNet``
(model.py:13-151): f_maps int → ×2 geometric progression per level
(utils.py:109-110), encoder stack collecting reversed skip features, decoder
zip, 1×1(×1) final conv.  Parity quirk preserved: the final
sigmoid/softmax is *constructed* but never applied in forward (commented out
at model.py:147-149) — ``__call__`` always returns logits, and
``final_activation()`` exposes the activation for the trainer/predictor to
apply explicitly (the reconciled logits-vs-probs contract of SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.registry import Registry
from .blocks3d import Decoder, Encoder
from .layers2d import TorchConv

MODELS_3D = Registry("model")


def number_of_features_per_level(init_channel_number: int, num_levels: int) -> List[int]:
    """f_maps geometric progression (reference utils.py:109-110)."""
    return [init_channel_number * 2**k for k in range(num_levels)]


class AbstractUNet(nn.Module):
    """Base encoder/decoder U-Net (reference model.py:13-151)."""

    in_channels: int = 1
    out_channels: int = 1
    final_sigmoid: bool = True
    basic_module: str = "DoubleConv"
    f_maps: Union[int, Sequence[int]] = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    is_segmentation: bool = True
    conv_kernel_size: Union[int, Sequence[int]] = 3
    pool_kernel_size: Union[int, Sequence[int]] = 2
    conv_padding: Union[int, Sequence[int]] = 1
    conv_upscale: int = 2
    upsample: Optional[str] = "default"
    dropout_prob: Union[float, Tuple[float, float]] = 0.1
    is3d: bool = True
    dtype: Optional[Any] = None
    # rematerialize encoder/decoder blocks in the backward pass: trades ~30%
    # extra FLOPs for activation memory — the standard lever for big 3D
    # patches (jax.checkpoint / nn.remat)
    remat: bool = False
    # checkpoint policy under remat (ops/remat.py): 'save_convs_norms'
    # (keep conv + GN outputs) measured +2% vs +9% save_convs / +30%
    # whole-block on the 3D config of record (PERF.md round-4 sweep)
    remat_policy: Optional[str] = None

    def _f_maps(self) -> List[int]:
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)
        f_maps = list(f_maps)
        assert len(f_maps) > 1, "Required at least 2 levels in the U-Net"
        if "g" in self.layer_order:
            assert self.num_groups is not None, (
                "num_groups must be specified if GroupNorm is used"
            )
        return f_maps

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f_maps = self._f_maps()
        if self.remat:
            from ..ops.remat import resolve_policy

            # `train` is python control flow inside the blocks → static
            policy = resolve_policy(self.remat_policy)
            encoder_cls = nn.remat(Encoder, static_argnums=(2,), policy=policy)
            decoder_cls = nn.remat(Decoder, static_argnums=(3,), policy=policy)
        else:
            encoder_cls, decoder_cls = Encoder, Decoder

        # Encoder path (first level without pooling; reference
        # create_encoders, buildingblocks.py:553-601).
        encoders_features = []
        for i, out_feature_num in enumerate(f_maps):
            x = encoder_cls(
                out_channels=out_feature_num,
                conv_kernel_size=self.conv_kernel_size,
                apply_pooling=(i > 0),
                pool_kernel_size=self.pool_kernel_size,
                basic_module=self.basic_module,
                conv_layer_order=self.layer_order,
                num_groups=self.num_groups,
                padding=self.conv_padding,
                upscale=self.conv_upscale,
                dropout_prob=self.dropout_prob,
                is3d=self.is3d,
                dtype=self.dtype,
                name=f"encoder{i}",
            )(x, train)
            encoders_features.insert(0, x)
        encoders_features = encoders_features[1:]

        # Decoder path (reference create_decoders, buildingblocks.py:604-639).
        reversed_f_maps = list(reversed(f_maps))
        for i, encoder_features in enumerate(encoders_features):
            x = decoder_cls(
                out_channels=reversed_f_maps[i + 1],
                conv_kernel_size=self.conv_kernel_size,
                basic_module=self.basic_module,
                conv_layer_order=self.layer_order,
                num_groups=self.num_groups,
                padding=self.conv_padding,
                upsample=self.upsample,
                dropout_prob=self.dropout_prob,
                is3d=self.is3d,
                dtype=self.dtype,
                name=f"decoder{i}",
            )(encoder_features, x, train)

        nsp = 3 if self.is3d else 2
        x = TorchConv(
            self.out_channels, (1,) * nsp, dtype=self.dtype, name="final_conv"
        )(x)
        # Reference parity: forward always returns logits (model.py:145-151);
        # apply self.final_activation() explicitly where probabilities are
        # needed (trainer eval, predictor).
        return x.astype(jnp.float32) if x.dtype != jnp.float32 else x

    def final_activation(self) -> Optional[Callable[[jax.Array], jax.Array]]:
        """The activation the reference constructs (model.py:116-124):
        sigmoid / channel softmax for segmentation, None for regression."""
        if not self.is_segmentation:
            return None
        if self.final_sigmoid:
            return jax.nn.sigmoid
        return lambda x: jax.nn.softmax(x, axis=-1)


@MODELS_3D.register("UNet3D")
class UNet3D(AbstractUNet):
    """3D U-Net (Çiçek et al. 2016): DoubleConv blocks, nearest upsampling,
    concat joins (reference model.py:154-194)."""

    basic_module: str = "DoubleConv"
    num_levels: int = 4
    is3d: bool = True


@MODELS_3D.register("ResidualUNet3D")
class ResidualUNet3D(AbstractUNet):
    """Residual 3D U-Net (Lee et al. 2017): ResNetBlocks, deconv upsampling,
    summation joins, 5 levels (reference model.py:197-236)."""

    basic_module: str = "ResNetBlock"
    num_levels: int = 5
    is3d: bool = True


@MODELS_3D.register("ResidualUNetSE3D")
class ResidualUNetSE3D(AbstractUNet):
    """Residual 3D U-Net with squeeze-excitation blocks
    (reference model.py:239-280)."""

    basic_module: str = "ResNetBlockSE"
    num_levels: int = 5
    is3d: bool = True


@MODELS_3D.register("UNet2D")
class UNet2D(AbstractUNet):
    """2D U-Net through the same machinery (reference model.py:283-320)."""

    basic_module: str = "DoubleConv"
    num_levels: int = 4
    is3d: bool = False


@MODELS_3D.register("ResidualUNet2D")
class ResidualUNet2D(AbstractUNet):
    """2D residual U-Net (reference model.py:323-359)."""

    basic_module: str = "ResNetBlock"
    num_levels: int = 5
    is3d: bool = False


_MODEL_FIELDS = {
    "in_channels", "out_channels", "final_sigmoid", "f_maps", "layer_order",
    "num_groups", "num_levels", "is_segmentation", "conv_kernel_size",
    "pool_kernel_size", "conv_padding", "conv_upscale", "upsample",
    "dropout_prob", "dtype", "remat", "remat_policy",
}


def get_model(model_config) -> AbstractUNet:
    """Name-dispatched model construction (reference model.py:362-364)."""
    cfg = dict(model_config)
    name = cfg.pop("name")
    cls = MODELS_3D.get(name)
    kwargs = {k: v for k, v in cfg.items() if k in _MODEL_FIELDS}
    if isinstance(kwargs.get("f_maps"), list):
        kwargs["f_maps"] = tuple(kwargs["f_maps"])
    return cls(**kwargs)
