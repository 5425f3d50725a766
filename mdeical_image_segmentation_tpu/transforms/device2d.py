"""On-device, jit-fused 2D train-time augmentation.

TPU-native replacement for the reference's host-side albumentations pipeline
(/root/reference/dataset/unet2d_dataset/MYDataset.py:127-141):

    HorizontalFlip(p=.5) · VerticalFlip(p=.5) · RandomRotate90(p=.5)
    · Transpose(p=.5) · RandomBrightnessContrast(p=.5)

Instead of per-sample Python/numpy work in DataLoader workers, the whole
batch is augmented in one jitted function keyed by a PRNG key — it fuses with
the normalization and the first conv of the train step, so augmentation costs
~zero extra HBM round-trips.  Geometry ops apply identically to image and
mask (the raw/label lock the reference gets from albumentations' shared
targets); intensity ops apply to the image only.

All ops keep static shapes (flips/rot90/transpose of square images are pure
reverses/axis-swaps).  Per-sample randomness comes from folding the step key
with the sample index and vmapping.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Augment2DConfig:
    p_hflip: float = 0.5
    p_vflip: float = 0.5
    p_rot90: float = 0.5
    p_transpose: float = 0.5
    p_brightness_contrast: float = 0.5
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2


def _augment_one(
    key: jax.Array,
    image: jax.Array,  # (H, W, C) float in [0, 1]
    mask: jax.Array,  # (H, W, Cm)
    cfg: Augment2DConfig,
) -> Tuple[jax.Array, jax.Array]:
    kh, kv, kr, krk, kt, kb, ka, kbv = jax.random.split(key, 8)

    def maybe(p, k, fn, img, msk):
        do = jax.random.uniform(k) < p
        return (
            jnp.where(do, fn(img), img),
            jnp.where(do, fn(msk), msk),
        )

    # HorizontalFlip: left-right (axis=1); VerticalFlip: up-down (axis=0).
    image, mask = maybe(cfg.p_hflip, kh, lambda a: jnp.flip(a, axis=1), image, mask)
    image, mask = maybe(cfg.p_vflip, kv, lambda a: jnp.flip(a, axis=0), image, mask)

    # RandomRotate90: with prob p, rotate by k ∈ {0,1,2,3} quarter-turns
    # (albumentations draws k uniformly when triggered).
    k90 = jnp.where(
        jax.random.uniform(kr) < cfg.p_rot90, jax.random.randint(krk, (), 0, 4), 0
    )

    def rot(a):
        return jax.lax.switch(
            k90,
            [
                lambda x: x,
                lambda x: jnp.rot90(x, 1, axes=(0, 1)),
                lambda x: jnp.rot90(x, 2, axes=(0, 1)),
                lambda x: jnp.rot90(x, 3, axes=(0, 1)),
            ],
            a,
        )

    image, mask = rot(image), rot(mask)

    # Transpose (swap H and W — requires square inputs, as in the reference
    # where everything is resized square first).
    image, mask = maybe(
        cfg.p_transpose, kt, lambda a: jnp.swapaxes(a, 0, 1), image, mask
    )

    # RandomBrightnessContrast on the image only: albumentations defaults
    # alpha = 1 + U(-contrast, contrast), beta = U(-brightness, brightness)
    # scaled by the max value (images here are already in [0, 1]).
    do_bc = jax.random.uniform(kb) < cfg.p_brightness_contrast
    alpha = 1.0 + jax.random.uniform(
        ka, (), minval=-cfg.contrast_limit, maxval=cfg.contrast_limit
    )
    beta = jax.random.uniform(
        kbv, (), minval=-cfg.brightness_limit, maxval=cfg.brightness_limit
    )
    bc = jnp.clip(image * alpha + beta, 0.0, 1.0)
    image = jnp.where(do_bc, bc, image)

    return image, mask


def augment_batch(
    key: jax.Array,
    images: jax.Array,  # (N, H, W, C)
    labels: jax.Array,  # (N, H, W, Cm)
    cfg: Augment2DConfig = Augment2DConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Apply the reference train augmentations to a whole batch on device."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, i, m: _augment_one(k, i, m, cfg))(
        keys, images, labels
    )
