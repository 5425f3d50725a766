"""Config-driven 3D model bundle — the HF 3D wrapper equivalent.

Reference: ``UNet3DForMedicalSegmentation[Config]``
(/root/reference/model/unet3d/UNet3D.py:18-154): selects UNet3D /
ResidualUNet3D / ResidualUNetSE3D by ``unet_type``, builds the loss from
``loss_config`` via the registry, and — parity quirk preserved and
documented — applies the sigmoid/softmax activation **before** the loss and
returns the *activated* output as ``logits`` (UNet3D.py:140-154).  Set
``activate_before_loss=False`` for the conventional logits-into-loss contract
(the reconciled behavior recommended in SURVEY.md §7).

Batch contract: ``forward(volume, target, weight)`` with channels-last
arrays; CE-family losses take integer targets of shape (N, *spatial).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..losses.losses3d import get_loss_criterion
from .unet3d import MODELS_3D, AbstractUNet
from .wrappers import SegOutput


@dataclasses.dataclass
class UNet3DConfig:
    """Reference UNet3DForMedicalSegmentationConfig parity (UNet3D.py:18-59)."""

    in_channels: int = 1
    out_channels: int = 1
    final_sigmoid: bool = True
    basic_module: str = "DoubleConv"  # kept for config parity; unet_type decides
    f_maps: Union[int, Tuple[int, ...]] = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    is_segmentation: bool = True
    conv_kernel_size: int = 3
    pool_kernel_size: int = 2
    conv_padding: int = 1
    conv_upscale: int = 2
    upsample: str = "default"
    dropout_prob: float = 0.1
    is3d: bool = True
    loss_config: Optional[Dict[str, Any]] = None
    unet_type: str = "UNet3D"  # UNet3D | ResidualUNet3D | ResidualUNetSE3D
    activate_before_loss: bool = True  # reference parity (UNet3D.py:140-150)
    compute_dtype: str = "float32"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UNet3DConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        if isinstance(d.get("f_maps"), list):
            d["f_maps"] = tuple(d["f_maps"])
        return cls(**d)


class UNet3DForMedicalSegmentation:
    """Stateless (module, activation, criterion) bundle."""

    def __init__(self, config: UNet3DConfig):
        self.config = config
        cls = MODELS_3D.get(config.unet_type)
        kwargs = dict(
            in_channels=config.in_channels,
            out_channels=config.out_channels,
            final_sigmoid=config.final_sigmoid,
            f_maps=tuple(config.f_maps)
            if isinstance(config.f_maps, (list, tuple))
            else config.f_maps,
            layer_order=config.layer_order,
            num_groups=config.num_groups,
            num_levels=config.num_levels,
            is_segmentation=config.is_segmentation,
            conv_kernel_size=tuple(config.conv_kernel_size)
            if isinstance(config.conv_kernel_size, (list, tuple))
            else config.conv_kernel_size,
            pool_kernel_size=tuple(config.pool_kernel_size)
            if isinstance(config.pool_kernel_size, (list, tuple))
            else config.pool_kernel_size,
            conv_padding=config.conv_padding,
            conv_upscale=config.conv_upscale,
            upsample=config.upsample,
            dropout_prob=config.dropout_prob,
        )
        if config.compute_dtype != "float32":
            kwargs["dtype"] = jnp.dtype(config.compute_dtype)
        self.module: AbstractUNet = cls(**kwargs)
        self.activation = self._choose_activation(config)
        loss_config = config.loss_config or {"loss": {"name": "BCEDiceLoss"}}
        self.loss_criterion = get_loss_criterion(loss_config)

    @staticmethod
    def _choose_activation(config: UNet3DConfig):
        """Reference chose_activation (UNet3D.py:123-132)."""
        if config.is_segmentation and config.final_sigmoid:
            return jax.nn.sigmoid
        if config.is_segmentation and not config.final_sigmoid:
            return lambda x: jax.nn.softmax(x, axis=-1)
        return None

    def init(self, rngs, volume: jax.Array, train: bool = False):
        return self.module.init(rngs, volume, train)

    def apply(
        self,
        variables,
        volume: jax.Array,
        target: Optional[jax.Array] = None,
        weight: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        mutable: Any = False,
    ):
        result = self.module.apply(variables, volume, train, rngs=rngs, mutable=mutable)
        raw, mutated = result if mutable else (result, None)

        activated = self.activation(raw) if self.activation is not None else raw
        loss = None
        if target is not None:
            loss_input = activated if self.config.activate_before_loss else raw
            if weight is None:
                loss = self.loss_criterion(loss_input, target)
            else:
                loss = self.loss_criterion(loss_input, target, weight)
        # Reference returns the *activated* output in the logits slot
        # (UNet3D.py:151-154).
        out = SegOutput(loss=loss, logits=activated, labels=target)
        return (out, mutated) if mutable else out

    # -- persistence ---------------------------------------------------------

    def save_pretrained(self, path: str, variables) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(variables))

    @classmethod
    def from_pretrained(cls, path: str) -> Tuple["UNet3DForMedicalSegmentation", Any]:
        with open(os.path.join(path, "config.json")) as f:
            config = UNet3DConfig.from_dict(json.load(f))
        model = cls(config)
        nsp = 3 if config.is3d else 2
        sample = jnp.zeros((1,) + (32,) * nsp + (config.in_channels,), jnp.float32)
        # structure-only template via eval_shape: no device work, no compile
        # (an eager init costs minutes through a remote-device tunnel, r5)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample)
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())
        return model, variables
