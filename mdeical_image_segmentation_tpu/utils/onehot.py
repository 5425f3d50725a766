"""One-hot expansion with ignore_index preservation.

Reference: ``expand_as_one_hot`` (/root/reference/model/unet3d/utils.py:222-254)
— scatter a (N, *spatial) integer label volume into (N, *spatial, C) one-hot
(channels-last here), keeping ``ignore_index`` voxels as ignore_index across
all channels so downstream masking can find them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def expand_as_one_hot(
    labels: jax.Array, num_classes: int, ignore_index: Optional[int] = None
) -> jax.Array:
    """(N, *spatial) int → (N, *spatial, C) float one-hot (channels-last)."""
    t = labels.astype(jnp.int32)
    if ignore_index is not None:
        mask = t == ignore_index
        safe = jnp.where(mask, 0, t)
        onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
        return jnp.where(mask[..., None], float(ignore_index), onehot)
    return jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
