"""SSIM / MS-SSIM in pure JAX (channels-last), pytorch_msssim-parity.

The reference's hybrid segmentation loss uses
``pytorch_msssim.MS_SSIM(data_range=1.0, size_average=True, channel=1)``
(reference model/unet2d/loss.py:21-28).  This module reimplements the same
numerics from the published algorithm (Wang et al., "Multiscale structural
similarity for image quality assessment") with the library's conventions:

- separable 11-tap gaussian window, sigma 1.5, VALID convolution;
- per-level contrast term ``cs`` ReLU'd, final product over levels weighted by
  (0.0448, 0.2856, 0.3001, 0.2363, 0.1333);
- between levels: 2x2 average pooling with symmetric zero padding ``s % 2``
  per spatial dim, divisor always 4 (count_include_pad).

Everything is jit-able and differentiable; the gaussian filters are depthwise
convolutions, which XLA fuses with the surrounding elementwise ops.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=32)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur_nhwc(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable VALID gaussian blur over H and W of an NHWC array."""
    c = x.shape[-1]
    size = win.shape[0]
    kh = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    x = lax.conv_general_dilated(
        x, kw.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return x


def _ssim_maps(
    x: jax.Array,
    y: jax.Array,
    *,
    data_range: float,
    win_size: int,
    win_sigma: float,
    k: Tuple[float, float],
) -> Tuple[jax.Array, jax.Array]:
    """Per-channel mean SSIM and CS over the VALID interior, shape (N, C)."""
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))

    mu1 = _depthwise_blur_nhwc(x, win)
    mu2 = _depthwise_blur_nhwc(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur_nhwc(x * x, win) - mu1_sq
    sigma2_sq = _depthwise_blur_nhwc(y * y, win) - mu2_sq
    sigma12 = _depthwise_blur_nhwc(x * y, win) - mu1_mu2

    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def _avg_pool2_padded(x: jax.Array) -> jax.Array:
    """2x2/2 average pool with symmetric zero pad (s % 2), divisor always 4."""
    pads = [(s % 2, s % 2) for s in x.shape[1:3]]
    # literal zero init → monoid reduce_window_sum (reverse-differentiable
    # under jit; a traced init hits the generic path with no transpose rule)
    summed = lax.reduce_window(
        x,
        np.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), *pads, (0, 0)),
    )
    return summed * 0.25


def ssim(
    x: jax.Array,
    y: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k: Tuple[float, float] = (0.01, 0.03),
    size_average: bool = True,
) -> jax.Array:
    """Single-scale SSIM of NHWC images."""
    s, _ = _ssim_maps(
        x, y, data_range=data_range, win_size=win_size, win_sigma=win_sigma, k=k
    )
    return s.mean() if size_average else s


def ms_ssim(
    x: jax.Array,
    y: jax.Array,
    *,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights: Sequence[float] = MS_SSIM_WEIGHTS,
    k: Tuple[float, float] = (0.01, 0.03),
    size_average: bool = True,
) -> jax.Array:
    """Multi-scale SSIM of NHWC images (pytorch_msssim MS_SSIM parity).

    Requires min(H, W) > (win_size - 1) * 2**(levels-1) — 161 px for the
    defaults, satisfied by the 256/512 training resolutions.
    """
    smaller = min(x.shape[1], x.shape[2])
    levels = len(weights)
    if smaller <= (win_size - 1) * 2 ** (levels - 1):
        raise ValueError(
            f"image too small for {levels}-level ms_ssim with win_size={win_size}: "
            f"min spatial dim {smaller}"
        )
    vals = []
    for i in range(levels):
        s, cs = _ssim_maps(
            x, y, data_range=data_range, win_size=win_size, win_sigma=win_sigma, k=k
        )
        if i < levels - 1:
            vals.append(jax.nn.relu(cs))
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
        else:
            vals.append(jax.nn.relu(s))
    stacked = jnp.stack(vals)  # (levels, N, C)
    w = jnp.asarray(weights, dtype=stacked.dtype).reshape(-1, 1, 1)
    out = jnp.prod(stacked**w, axis=0)
    return out.mean() if size_average else out
