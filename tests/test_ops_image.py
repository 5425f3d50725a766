"""Torch-parity golden tests for the image ops (SURVEY.md §7 'hard parts':
maxpool ceil_mode, bilinear align_corners conventions, center_crop rounding,
nearest resize).  torch (CPU) is used only as the independent oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mdeical_image_segmentation_tpu.ops.image import (
    avg_pool_nd,
    center_crop,
    interpolate_nearest_nd,
    max_pool2d,
    resize_bilinear,
    upsample_bilinear2d,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def _to_nhwc(t_nchw):
    return np.moveaxis(t_nchw.numpy(), 1, -1)


@pytest.mark.parametrize("size", [16, 17, 21, 33])
@pytest.mark.parametrize("k", [2, 4, 8])
def test_max_pool_ceil_mode_matches_torch(size, k):
    x = np.random.RandomState(0).randn(2, size, size, 3).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), k, ceil_mode=True))
    ref = _to_nhwc(F.max_pool2d(_nchw(x), k, k, ceil_mode=True))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


@pytest.mark.parametrize("size,k", [(16, 2), (17, 3), (20, 4)])
def test_max_pool_floor_mode_matches_torch(size, k):
    x = np.random.RandomState(1).randn(1, size, size, 2).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), k))
    ref = _to_nhwc(F.max_pool2d(_nchw(x), k))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize(
    "shape,win", [((2, 8, 16, 16, 4), (2, 2, 2)), ((2, 16, 16, 3), 2), ((1, 12, 12, 2), (3, 3))]
)
def test_max_pool_pairwise_bit_exact_vs_native(shape, win, monkeypatch):
    """The pairwise select decomposition (TPUSEG_POOL, PERF.md) must be
    bit-exact vs the reduce_window/select_and_scatter path in BOTH forward
    and gradient, including tie-heavy inputs (ties route to the first max
    in window scan order — torch semantics)."""
    import jax

    from mdeical_image_segmentation_tpu.ops.image import max_pool_nd

    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    x[..., ::2] = np.round(x[..., ::2] * 2) / 2  # force many exact ties
    gy = None

    def run(mode):
        nonlocal gy
        monkeypatch.setenv("TPUSEG_POOL", mode)
        y, vjp = jax.vjp(lambda x: max_pool_nd(x, win), jnp.asarray(x))
        if gy is None:
            gy = np.random.default_rng(1).standard_normal(y.shape).astype(np.float32)
        return np.asarray(y), np.asarray(vjp(jnp.asarray(gy))[0])

    yn, gn = run("native")
    yp, gp = run("pairwise")
    np.testing.assert_array_equal(yn, yp)
    np.testing.assert_array_equal(gn, gp)


@pytest.mark.parametrize(
    "shape,win",
    [
        ((2, 8, 16, 16, 4), (2, 2, 2)),
        ((1, 9, 12, 12, 2), (3, 3, 3)),   # dividing depth 9/3
        ((2, 7, 16, 16, 4), (2, 2, 2)),   # non-dividing depth -> native fallback
        ((2, 8, 17, 17, 4), (2, 2, 2)),   # floor-mode H/W tail crop
    ],
)
def test_max_pool_depth2d_bit_exact_vs_native(shape, win, monkeypatch):
    """The depth2d decomposition (2D reduce_window + leading-axis depth
    select, TPUSEG_POOL=depth2d) must be bit-exact vs the native 3D
    reduce_window/select_and_scatter path in BOTH forward and gradient,
    including tie-heavy inputs (composition routes ties to the first max
    in row-major (d, h, w) window scan order — torch semantics)."""
    import jax

    from mdeical_image_segmentation_tpu.ops.image import max_pool_nd

    x = np.random.default_rng(0).standard_normal(shape).astype(np.float32)
    x[..., ::2] = np.round(x[..., ::2] * 2) / 2  # force many exact ties
    gy = None

    def run(mode):
        nonlocal gy
        monkeypatch.setenv("TPUSEG_POOL", mode)
        y, vjp = jax.vjp(lambda x: max_pool_nd(x, win), jnp.asarray(x))
        if gy is None:
            gy = np.random.default_rng(1).standard_normal(y.shape).astype(np.float32)
        return np.asarray(y), np.asarray(vjp(jnp.asarray(gy))[0])

    yn, gn = run("native")
    yd, gd = run("depth2d")
    np.testing.assert_array_equal(yn, yd)
    np.testing.assert_array_equal(gn, gd)


def test_max_pool_pairwise_grad_matches_torch(monkeypatch):
    """Tie-breaking in the pairwise backward must match torch's MaxPool2d
    (whole gradient to the first max in row-major window order)."""
    import jax

    from mdeical_image_segmentation_tpu.ops.image import max_pool_nd

    monkeypatch.setenv("TPUSEG_POOL", "pairwise")
    x = np.random.default_rng(2).standard_normal((2, 4, 8, 8)).astype(np.float32)
    x[:, :, ::2] = np.round(x[:, :, ::2])
    xt = torch.tensor(x, requires_grad=True)
    yt = F.max_pool2d(xt, 2)
    gy = torch.tensor(
        np.random.default_rng(3).standard_normal(tuple(yt.shape)).astype(np.float32)
    )
    yt.backward(gy)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    yj, vjp = jax.vjp(lambda a: max_pool_nd(a, 2), xj)
    gj = vjp(jnp.asarray(np.moveaxis(gy.numpy(), 1, -1)))[0]
    np.testing.assert_array_equal(_to_nhwc(yt.detach()), np.asarray(yj))
    np.testing.assert_array_equal(_to_nhwc(xt.grad), np.asarray(gj))


def test_pool_mode_env_knob_strict(monkeypatch):
    from mdeical_image_segmentation_tpu.ops.image import max_pool_nd

    monkeypatch.setenv("TPUSEG_POOL", "bogus")
    with pytest.raises(ValueError, match="TPUSEG_POOL"):
        max_pool_nd(jnp.zeros((1, 4, 4, 1)), 2)


def test_avg_pool_matches_torch():
    x = np.random.RandomState(2).randn(2, 12, 12, 3).astype(np.float32)
    ours = np.asarray(avg_pool_nd(jnp.asarray(x), 2))
    ref = _to_nhwc(F.avg_pool2d(_nchw(x), 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("scale", [2, 4, 8, 16])
@pytest.mark.parametrize("align", [False, True])
def test_bilinear_upsample_matches_torch(scale, align):
    x = np.random.RandomState(3).randn(2, 12, 12, 3).astype(np.float32)
    ours = np.asarray(upsample_bilinear2d(jnp.asarray(x), scale, align_corners=align))
    ref = _to_nhwc(
        F.interpolate(_nchw(x), scale_factor=scale, mode="bilinear",
                      align_corners=align)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_size", [(7, 13), (24, 24), (5, 30)])
def test_bilinear_resize_arbitrary_matches_torch(out_size):
    x = np.random.RandomState(4).randn(1, 16, 16, 2).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size))
    ref = _to_nhwc(
        F.interpolate(_nchw(x), size=out_size, mode="bilinear", align_corners=False)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_size", [(8, 8), (31, 17), (64, 64)])
def test_nearest_matches_torch(out_size):
    x = np.random.RandomState(5).randn(1, 16, 16, 2).astype(np.float32)
    ours = np.asarray(interpolate_nearest_nd(jnp.asarray(x), out_size))
    ref = _to_nhwc(F.interpolate(_nchw(x), size=out_size, mode="nearest"))
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("in_size,out_size", [(10, 6), (11, 6), (11, 4), (8, 8), (6, 9)])
def test_center_crop_matches_torchvision_rule(in_size, out_size):
    # torchvision center_crop: crop_top = int(round((h - out) / 2.)),
    # zero-pad when out > in (padding split low = (out-in+1)//2).
    x = np.random.RandomState(6).randn(1, in_size, in_size, 1).astype(np.float32)
    ours = np.asarray(center_crop(jnp.asarray(x), (out_size, out_size)))
    if out_size <= in_size:
        off = int(round((in_size - out_size) / 2.0))
        ref = x[:, off : off + out_size, off : off + out_size]
    else:
        lo = (out_size - in_size + 1) // 2
        ref = np.zeros((1, out_size, out_size, 1), np.float32)
        ref[:, lo : lo + in_size, lo : lo + in_size] = x
    np.testing.assert_allclose(ours, ref)
