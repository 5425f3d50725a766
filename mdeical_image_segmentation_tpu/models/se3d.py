"""Squeeze-and-Excitation blocks (channels-last, rank-agnostic).

Reference: /root/reference/model/unet3d/se.py — ChannelSELayer3D (global
avg-pool + 2-layer FC bottleneck + sigmoid channel gate, se.py:18-51),
SpatialSELayer3D (1×1×1 conv + sigmoid spatial gate, se.py:54-92),
ChannelSpatialSELayer3D (elementwise max of both, se.py:95-113).

These are elementwise-gate ops; XLA fuses the gates into the surrounding
convs.  Works for both (N, D, H, W, C) and (N, H, W, C) inputs.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers2d import TorchConv


class ChannelSELayer(nn.Module):
    """Channel squeeze-excitation (cSE)."""

    reduction_ratio: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        spatial_axes = tuple(range(1, x.ndim - 1))
        squeeze = x.mean(axis=spatial_axes)  # (N, C)
        reduced = max(c // self.reduction_ratio, 1)
        h = nn.relu(nn.Dense(reduced, dtype=self.dtype)(squeeze))
        gate = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype)(h))
        gate = gate.reshape(gate.shape[:1] + (1,) * len(spatial_axes) + (c,))
        return x * gate


class SpatialSELayer(nn.Module):
    """Spatial squeeze-excitation (sSE): 1×…×1 conv to one channel + sigmoid."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ones = (1,) * (x.ndim - 2)
        gate = jax.nn.sigmoid(
            TorchConv(1, ones, dtype=self.dtype)(x)
        )
        return x * gate


class ChannelSpatialSELayer(nn.Module):
    """Concurrent cSE/sSE merged by elementwise max (scSE)."""

    reduction_ratio: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cse = ChannelSELayer(self.reduction_ratio, dtype=self.dtype)(x)
        sse = SpatialSELayer(dtype=self.dtype)(x)
        return jnp.maximum(cse, sse)


SE_MODULES = {
    "cse": lambda dtype: ChannelSELayer(reduction_ratio=1, dtype=dtype),
    "sse": lambda dtype: SpatialSELayer(dtype=dtype),
    "scse": lambda dtype: ChannelSpatialSELayer(reduction_ratio=1, dtype=dtype),
}
