"""Config-driven 2D model bundles — the HF-wrapper equivalent.

Reference: ``UNetConfig`` / ``UNetModel`` / ``UNetModelOutput``
(/root/reference/model/unet2d/unet.py:1156-1214).  The torch wrapper is a
PreTrainedModel whose forward computes the loss; in JAX the idiomatic shape is
a pure ``apply`` over explicit params, so the bundle pairs:

- a Flax module selected by ``unet_type`` (UNet → BCE-or-CE loss; UNet_3Plus /
  UNet_3Plus_DeepSup[_CGM] → hybrid SegmentationLoss, matching
  unet.py:1181-1196),
- a criterion applied per head (deep-supervision tuples sum the loss over all
  5 heads and report head-1 as the logits, unet.py:1199-1213).  Note: the
  reference wrapper cannot construct the CGM variant at all (unet.py:1181-1196
  has no branch for it); we expose it as an extension — since CGM outputs are
  already sigmoided, the hybrid criterion's internal sigmoid squashes them a
  second time, exactly as the reference code would if wired identically,
- ``save_pretrained`` / ``from_pretrained`` round-trips (config.json +
  msgpack-serialized params) mirroring the PretrainedConfig contract.

The batch contract is the collator's: ``{"images", "labels"}`` with
channels-last arrays.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..losses.losses2d import bce_with_logits, cross_entropy, segmentation_loss
from .unet2d import UNet, UNet3Plus, UNet3PlusDeepSup, UNet3PlusDeepSupCGM

UNET_TYPES = {
    "UNet": UNet,
    "UNet_3Plus": UNet3Plus,
    "UNet_3Plus_DeepSup": UNet3PlusDeepSup,
    "UNet_3Plus_DeepSup_CGM": UNet3PlusDeepSupCGM,
}


@dataclasses.dataclass
class UNetConfig:
    """Reference UNetConfig parity (unet.py:1163-1175) + TPU knobs."""

    in_channels: int = 1
    out_channels: int = 1
    unet_type: str = "UNet"
    # TPU extensions (absent in the reference):
    base_features: int = 64          # classic-UNet width scale
    bn_axis_name: Optional[str] = None  # sync-BN mesh axis
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # "bfloat16" runs the convs on the MXU in bf16
    remat: bool = False              # rematerialize blocks (all 2D variants)
    # checkpoint policy under remat (ops/remat.py): None = whole-block
    # recompute; 'save_convs' keeps conv outputs (the only policy that fits
    # TPU compile limits at 512px); 'save_convs_norms' keeps norm outputs too
    remat_policy: Optional[str] = None
    # HF-contract fields (consumed by the trainer):
    label_names: str = "labels"
    main_input_name: str = "images"

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@flax.struct.dataclass
class SegOutput:
    """Reference UNetModelOutput parity (unet.py:1156-1160)."""

    loss: Optional[jax.Array] = None
    logits: Optional[jax.Array] = None
    labels: Optional[jax.Array] = None

    def __getitem__(self, key):  # dict-style access like HF ModelOutput
        return getattr(self, key)


class UNetModel:
    """Stateless bundle of (flax module, criterion) selected by config.

    Usage::

        model = UNetModel(UNetConfig(unet_type="UNet_3Plus"))
        variables = model.init(rng, sample_images)
        out = model.apply(variables, images, labels, train=True, rngs=...)
        out.loss, out.logits
    """

    def __init__(self, config: UNetConfig):
        self.config = config
        cls = UNET_TYPES.get(config.unet_type)
        if cls is None:
            raise KeyError(
                f"unknown unet_type {config.unet_type!r}; one of {sorted(UNET_TYPES)}"
            )
        kwargs: Dict[str, Any] = dict(in_channels=config.in_channels)
        if config.compute_dtype != "float32":
            kwargs["dtype"] = jnp.dtype(config.compute_dtype)
        if config.unet_type == "UNet":
            kwargs.update(
                out_channels=config.out_channels,
                base_features=config.base_features,
                remat=config.remat,
                remat_policy=config.remat_policy,
            )
            self.criterion = (
                cross_entropy if config.out_channels > 1 else bce_with_logits
            )
        else:
            kwargs.update(
                n_classes=config.out_channels, bn_axis_name=config.bn_axis_name,
                remat=config.remat,
                remat_policy=config.remat_policy,
            )
            self.criterion = segmentation_loss
        self.module = cls(**kwargs)

    # -- flax passthroughs ---------------------------------------------------

    def init(self, rngs, images: jax.Array, train: bool = False):
        return self.module.init(rngs, images, train)

    def apply(
        self,
        variables,
        images: jax.Array,
        labels: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rngs: Optional[Dict[str, jax.Array]] = None,
        mutable: Any = False,
    ):
        """Forward + (optionally) loss.  Returns ``SegOutput`` or
        ``(SegOutput, mutated_vars)`` when ``mutable`` collections are given
        (BN batch stats under train)."""
        result = self.module.apply(
            variables, images, train, rngs=rngs, mutable=mutable
        )
        if mutable:
            raw, mutated = result
        else:
            raw, mutated = result, None

        # Losses and reported logits always in fp32 (bf16 stays inside the
        # conv stack; reductions/sigmoids in the loss need full precision).
        if isinstance(raw, tuple):
            heads = tuple(d.astype(jnp.float32) for d in raw)
            loss = None
            if labels is not None:
                loss = sum(self.criterion(d, labels) for d in heads)
            out = SegOutput(loss=loss, logits=heads[0], labels=labels)
        else:
            raw = raw.astype(jnp.float32)
            loss = self.criterion(raw, labels) if labels is not None else None
            out = SegOutput(loss=loss, logits=raw, labels=labels)
        return (out, mutated) if mutable else out

    # -- persistence ---------------------------------------------------------

    def save_pretrained(self, path: str, variables) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(self.config.to_dict(), f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(variables))

    @classmethod
    def from_pretrained(cls, path: str) -> Tuple["UNetModel", Any]:
        with open(os.path.join(path, "config.json")) as f:
            config = UNetConfig.from_dict(json.load(f))
        model = cls(config)
        # Build a structure template, then restore bytes into it.  The
        # template only needs tree structure + shapes/dtypes: eval_shape
        # traces init without running it (no device work, no compile — a
        # real init costs minutes through a remote-device tunnel, r5).
        sample = jnp.zeros((1, 64, 64, config.in_channels), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample)
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            variables = flax.serialization.from_bytes(template, f.read())
        return model, variables
