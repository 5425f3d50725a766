"""MS-SSIM correctness: identity, monotonicity, and a golden comparison
against an independent torch implementation of the same published algorithm
(gaussian-window SSIM pyramid with the standard 5 weights — the
pytorch_msssim conventions the reference loss depends on)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mdeical_image_segmentation_tpu.ops.msssim import (
    MS_SSIM_WEIGHTS,
    _gaussian_window,
    ms_ssim,
    ssim,
)


def _torch_gaussian_blur(x, win):
    # separable VALID depthwise blur, NCHW
    c = x.shape[1]
    w = torch.from_numpy(win).float()
    kh = w.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
    kw = w.view(1, 1, 1, -1).repeat(c, 1, 1, 1)
    x = F.conv2d(x, kh, groups=c)
    return F.conv2d(x, kw, groups=c)


def _torch_ssim(x, y, data_range=1.0, k=(0.01, 0.03)):
    win = _gaussian_window(11, 1.5)
    c1, c2 = (k[0] * data_range) ** 2, (k[1] * data_range) ** 2
    mu1, mu2 = _torch_gaussian_blur(x, win), _torch_gaussian_blur(y, win)
    s1 = _torch_gaussian_blur(x * x, win) - mu1 * mu1
    s2 = _torch_gaussian_blur(y * y, win) - mu2 * mu2
    s12 = _torch_gaussian_blur(x * y, win) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs
    return sm.flatten(2).mean(-1), cs.flatten(2).mean(-1)


def _torch_ms_ssim(x, y):
    weights = torch.tensor(MS_SSIM_WEIGHTS)
    vals = []
    for i in range(5):
        s, cs = _torch_ssim(x, y)
        if i < 4:
            vals.append(torch.relu(cs))
            pads = [s_ % 2 for s_ in x.shape[2:]]
            x = F.avg_pool2d(x, 2, padding=pads)
            y = F.avg_pool2d(y, 2, padding=pads)
        else:
            vals.append(torch.relu(s))
    stacked = torch.stack(vals)
    return torch.prod(stacked ** weights.view(-1, 1, 1), dim=0).mean()


def test_ssim_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ms_ssim_identity():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 192, 192, 1).astype(np.float32))
    assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_ms_ssim_monotonic_in_noise():
    rs = np.random.RandomState(2)
    x = rs.rand(1, 192, 192, 1).astype(np.float32)
    a = float(ms_ssim(jnp.asarray(x), jnp.asarray(np.clip(x + 0.05 * rs.randn(*x.shape), 0, 1).astype(np.float32))))
    b = float(ms_ssim(jnp.asarray(x), jnp.asarray(np.clip(x + 0.3 * rs.randn(*x.shape), 0, 1).astype(np.float32))))
    assert a > b


def test_ssim_matches_torch_oracle():
    rs = np.random.RandomState(3)
    x = rs.rand(2, 64, 64, 1).astype(np.float32)
    y = np.clip(x + 0.1 * rs.randn(*x.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    s, _ = _torch_ssim(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(y, -1, 1).copy()),
    )
    assert ours == pytest.approx(float(s.mean()), abs=2e-5)


def test_ms_ssim_matches_torch_oracle():
    rs = np.random.RandomState(4)
    x = rs.rand(1, 192, 192, 1).astype(np.float32)
    y = np.clip(x + 0.1 * rs.randn(*x.shape), 0, 1).astype(np.float32)
    ours = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = float(
        _torch_ms_ssim(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(y, -1, 1).copy()),
        )
    )
    assert ours == pytest.approx(ref, abs=5e-5)


def test_ms_ssim_rejects_small_images():
    x = jnp.zeros((1, 64, 64, 1))
    with pytest.raises(ValueError):
        ms_ssim(x, x)
