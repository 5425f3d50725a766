"""Fused conv+GN+ReLU Pallas block (ops/fused_conv.py) — numerics and
autodiff vs the unfused XLA composition, on the pallas interpreter (the
compiled path is TPU-only and measured in PERF.md)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.ops import fused_conv, norm
from mdeical_image_segmentation_tpu.ops.conv3d import slab_conv3d


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape) * scale, jnp.float32
    )


def _ref_fused(x, w, a, b, pre_relu=False, post_relu=True):
    kd = w.shape[0]
    pad = [((kd - 1) // 2,) * 2, (1, 1), (1, 1)]
    nd = x.ndim
    xt = x.astype(jnp.float32) * norm._bcast(a, nd) + norm._bcast(b, nd)
    if pre_relu:
        xt = jnp.maximum(xt, 0.0)
    y = slab_conv3d(xt.astype(x.dtype), w, padding=pad)
    return jnp.maximum(y, 0.0) if post_relu else y


@pytest.mark.parametrize("im2col", [True, False])
@pytest.mark.parametrize("kd", [1, 3])
def test_fused_matches_xla_composition(kd, im2col):
    n, d, h, w_, ci, co = 2, 4, 8, 16, 8, 16
    x = _rand((n, d, h, w_, ci))
    w = _rand((kd, 3, 3, ci, co), seed=1, scale=0.2)
    a = jnp.abs(_rand((n, ci), seed=2)) + 0.5
    b = _rand((n, ci), seed=3, scale=0.3)

    got = fused_conv.fused_conv3d(
        x, w, a, b, post_relu=True, im2col=im2col, interpret=True
    )
    want = _ref_fused(x, w, a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_pre_relu_mode():
    n, d, h, w_, ci, co = 1, 2, 6, 10, 8, 8
    x = _rand((n, d, h, w_, ci))
    w = _rand((3, 3, 3, ci, co), seed=1, scale=0.2)
    a = _rand((n, ci), seed=2)
    b = _rand((n, ci), seed=3)
    got = fused_conv.fused_conv3d(
        x, w, a, b, pre_relu=True, post_relu=False, interpret=True
    )
    want = _ref_fused(x, w, a, b, pre_relu=True, post_relu=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_bf16_tensor():
    n, d, h, w_, ci, co = 1, 3, 8, 8, 8, 8
    x = _rand((n, d, h, w_, ci)).astype(jnp.bfloat16)
    w = (_rand((3, 3, 3, ci, co), seed=1, scale=0.2)).astype(jnp.bfloat16)
    a = jnp.ones((n, ci), jnp.float32)
    b = jnp.zeros((n, ci), jnp.float32)
    got = fused_conv.fused_conv3d(x, w, a, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ref_fused(x, w, a, b)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=3e-2, atol=3e-2
    )


def _unfused_gcr(x, scale, bias, w, num_groups, eps=1e-5):
    xn = norm.group_norm(x, scale, bias, num_groups, eps)
    pad = [((w.shape[0] - 1) // 2,) * 2, (1, 1), (1, 1)]
    return jnp.maximum(slab_conv3d(xn, w, padding=pad), 0.0)


def test_gcr_block_forward_matches_unfused():
    n, d, h, w_, c, co, g = 2, 4, 8, 16, 16, 8, 4
    x = _rand((n, d, h, w_, c))
    scale = jnp.abs(_rand((c,), seed=4)) + 0.5
    bias = _rand((c,), seed=5, scale=0.2)
    w = _rand((3, 3, 3, c, co), seed=6, scale=0.2)

    got = fused_conv.gcr_fused_conv(x, scale, bias, w, g, 1e-5, True)
    want = _unfused_gcr(x, scale, bias, w, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gcr_block_gradients_match_unfused():
    n, d, h, w_, c, co, g = 1, 3, 6, 8, 8, 4, 2
    x = _rand((n, d, h, w_, c))
    scale = jnp.abs(_rand((c,), seed=4)) + 0.5
    bias = _rand((c,), seed=5, scale=0.2)
    w = _rand((3, 3, 3, c, co), seed=6, scale=0.2)
    tgt = _rand((n, d, h, w_, co), seed=7)

    def loss_fused(x, s, b, w):
        y = fused_conv.gcr_fused_conv(x, s, b, w, g, 1e-5, True)
        return jnp.sum(jnp.square(y - tgt))

    def loss_ref(x, s, b, w):
        return jnp.sum(jnp.square(_unfused_gcr(x, s, b, w, g) - tgt))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("hb", [None, 4, 2])
def test_fused_tiled_halos_match(hb, monkeypatch):
    """H-tiling with neighbor-block halos reproduces the untiled result
    exactly (tile boundaries included)."""
    if hb is not None:
        monkeypatch.setenv("TPUSEG_FUSED_HB", str(hb))
    n, d, h, w_, ci, co = 1, 2, 8, 16, 8, 8
    x = _rand((n, d, h, w_, ci), seed=11)
    w = _rand((3, 3, 3, ci, co), seed=12, scale=0.2)
    a = jnp.abs(_rand((n, ci), seed=13)) + 0.5
    b = _rand((n, ci), seed=14, scale=0.3)
    got = fused_conv.fused_conv3d(x, w, a, b, interpret=True)
    want = _ref_fused(x, w, a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci", [1, 3])
def test_fused_tiny_input_channels(ci):
    """ci < 8 takes the VPU broadcast-MAC path (Mosaic's lane-concat of
    1-lane vectors is broken on TPU; the matmul is MXU-hostile anyway)."""
    n, d, h, w_, co = 1, 2, 6, 8, 8
    x = _rand((n, d, h, w_, ci), seed=50)
    w = _rand((3, 3, 3, ci, co), seed=51, scale=0.3)
    a = jnp.ones((n, ci), jnp.float32)
    b = jnp.zeros((n, ci), jnp.float32)
    got = fused_conv.fused_conv3d(x, w, a, b, interpret=True)
    want = _ref_fused(x, w, a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _ref_double(x, w1, b1, w2, b2):
    z = jnp.maximum(fused_conv._conv2d_same(x, w1) + b1, 0.0)
    return jnp.maximum(fused_conv._conv2d_same(z, w2) + b2, 0.0), z


@pytest.mark.parametrize("hb", [None, 4])
@pytest.mark.parametrize("im2col", [True, False])
def test_double2d_matches_xla(im2col, hb, monkeypatch):
    if hb is not None:
        monkeypatch.setenv("TPUSEG_FUSED_HB", str(hb))
    n, h, w_, ci, c1, co = 2, 8, 12, 8, 16, 16
    x = _rand((n, h, w_, ci), seed=20)
    w1 = _rand((3, 3, ci, c1), seed=21, scale=0.2)
    b1 = _rand((c1,), seed=22, scale=0.2)
    w2 = _rand((3, 3, c1, co), seed=23, scale=0.2)
    b2 = _rand((co,), seed=24, scale=0.2)
    y, z = fused_conv.fused_double2d(
        x, w1, b1, w2, b2, im2col=im2col, interpret=True
    )
    y_ref, z_ref = _ref_double(x, w1, b1, w2, b2)
    np.testing.assert_allclose(z, z_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_double2d_gradients_match():
    n, h, w_, ci, c1, co = 1, 4, 6, 4, 8, 8
    x = _rand((n, h, w_, ci), seed=30)
    w1 = _rand((3, 3, ci, c1), seed=31, scale=0.2)
    b1 = _rand((c1,), seed=32, scale=0.2)
    w2 = _rand((3, 3, c1, co), seed=33, scale=0.2)
    b2 = _rand((co,), seed=34, scale=0.2)
    tgt = _rand((n, h, w_, co), seed=35)

    def loss_fused(*args):
        y = fused_conv.double_conv2d(*args, True)
        return jnp.sum(jnp.square(y - tgt))

    def loss_ref(*args):
        return jnp.sum(jnp.square(_ref_double(*args)[0] - tgt))

    g1 = jax.grad(loss_fused, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # opt-in (TPUSEG_FUSED_CONV) path; /verify + nightly run the slow tier
def test_unet2d_forward_unchanged_under_fused_path():
    """Model-level: the classic UNet forward is identical with the fused
    DoubleConvolution path forced (interpreted)."""
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

    x = _rand((1, 32, 32, 1), seed=40)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=4)
    )
    old = os.environ.pop("TPUSEG_FUSED_CONV", None)
    try:
        os.environ["TPUSEG_FUSED_CONV"] = "off"
        v = model.init(jax.random.PRNGKey(0), x)
        y_ref = model.apply(v, x, train=False).logits
        os.environ["TPUSEG_FUSED_CONV"] = "interpret"
        v_fused = model.init(jax.random.PRNGKey(0), x)
        y_fused = model.apply(v, x, train=False).logits
    finally:
        if old is None:
            os.environ.pop("TPUSEG_FUSED_CONV", None)
        else:
            os.environ["TPUSEG_FUSED_CONV"] = old

    assert jax.tree_util.tree_map(np.shape, v_fused) == (
        jax.tree_util.tree_map(np.shape, v)
    )
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda p, q: bool(jnp.allclose(p, q)), v_fused, v
        )
    )
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # opt-in (TPUSEG_FUSED_CONV) path; /verify + nightly run the slow tier
def test_unet3d_forward_unchanged_under_fused_path():
    """Model-level integration: forcing the fused 'gcr' path (interpreted)
    leaves the UNet3D forward and the param tree unchanged."""
    from mdeical_image_segmentation_tpu.models import get_model

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 1,
           "f_maps": 8, "num_levels": 2, "layer_order": "gcr"}
    x = _rand((1, 4, 8, 16, 1), seed=9)

    old = os.environ.pop("TPUSEG_FUSED_CONV", None)
    try:
        os.environ["TPUSEG_FUSED_CONV"] = "off"
        model = get_model(dict(cfg))
        v = model.init(jax.random.PRNGKey(0), x, False)
        y_ref = model.apply(v, x, False)
        os.environ["TPUSEG_FUSED_CONV"] = "interpret"
        v_fused = model.init(jax.random.PRNGKey(0), x, False)
        y_fused = model.apply(v, x, False)
    finally:
        if old is None:
            os.environ.pop("TPUSEG_FUSED_CONV", None)
        else:
            os.environ["TPUSEG_FUSED_CONV"] = old

    assert jax.tree_util.tree_map(np.shape, v_fused) == (
        jax.tree_util.tree_map(np.shape, v)
    )
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda p, q: bool(jnp.allclose(p, q)), v_fused, v
        )
    )
    assert chex_equal  # same init streams → identical params
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-4, atol=1e-5)


def test_mode_gate():
    # env validation is strict
    old = os.environ.pop("TPUSEG_FUSED_CONV", None)
    try:
        os.environ["TPUSEG_FUSED_CONV"] = "bogus"
        with pytest.raises(ValueError, match="TPUSEG_FUSED_CONV"):
            fused_conv.fused_gcr_mode((1, 2, 8, 8, 8), jnp.float32, 8, 8)
        os.environ["TPUSEG_FUSED_CONV"] = "off"
        assert fused_conv.fused_gcr_mode(
            (1, 2, 8, 8, 8), jnp.float32, 8, 8) is None
        os.environ["TPUSEG_FUSED_CONV"] = "interpret"
        assert fused_conv.fused_gcr_mode(
            (1, 2, 8, 8, 8), jnp.float32, 8, 8) is True
        # 512² now FITS via H-tiling; a plane too wide for even a 1-row
        # tile is the genuine misfit and falls back even when forced
        assert fused_conv.fused_gcr_mode(
            (1, 2, 512, 512, 64), jnp.float32, 64, 64) is True
        assert fused_conv.fused_gcr_mode(
            (1, 2, 8, 16384, 512), jnp.float32, 512, 512) is None
        os.environ.pop("TPUSEG_FUSED_CONV")
        # auto on CPU: never fuse compiled
        assert fused_conv.fused_gcr_mode(
            (1, 2, 8, 8, 8), jnp.float32, 8, 8) is None
    finally:
        if old is None:
            os.environ.pop("TPUSEG_FUSED_CONV", None)
        else:
            os.environ["TPUSEG_FUSED_CONV"] = old


@pytest.mark.slow  # opt-in (TPUSEG_FUSED_CONV) path; /verify + nightly run the slow tier
def test_fused_double2d_stands_aside_under_quant():
    """int8 PTQ routes every eligible conv through TorchConv's quant
    stand-in; the fused float DoubleConvolution kernel must therefore not
    engage in 'calib'/'int8' modes — otherwise quantize silently becomes a
    no-op for the classic UNet's double convs (review finding, round 3).
    Calibration under the forced fused path must collect the same scale
    tree as with fusion off."""
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.ops import quant

    x = _rand((1, 32, 32, 1), seed=11)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet",
                   base_features=8)
    )

    def apply_fn(v, xx, **kw):
        out = model.apply(v, xx, train=False, **kw)
        if isinstance(out, tuple):  # mutable=["quant"] during calibration
            res, upd = out
            return res.logits, upd
        return out.logits

    old = os.environ.pop("TPUSEG_FUSED_CONV", None)
    try:
        os.environ["TPUSEG_FUSED_CONV"] = "off"
        variables = model.init(jax.random.PRNGKey(0), x)
        scales_ref = quant.calibrate(apply_fn, variables, [(x,)])
        y_ref = quant.wrap_apply(apply_fn, "int8")(
            {**variables, **scales_ref}, x
        )
        os.environ["TPUSEG_FUSED_CONV"] = "interpret"
        scales_fused = quant.calibrate(apply_fn, variables, [(x,)])
        y_fused = quant.wrap_apply(apply_fn, "int8")(
            {**variables, **scales_fused}, x
        )
    finally:
        if old is None:
            os.environ.pop("TPUSEG_FUSED_CONV", None)
        else:
            os.environ["TPUSEG_FUSED_CONV"] = old

    assert jax.tree_util.tree_map(np.shape, scales_fused) == (
        jax.tree_util.tree_map(np.shape, scales_ref)
    )
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow  # opt-in (TPUSEG_FUSED_CONV) path; /verify + nightly run the slow tier
def test_fused_gcr_stands_aside_under_cross_shard_norm():
    """cross_shard_group_stats psums GroupNorm statistics inside ops.norm;
    the fused 'gcr' kernel computes LOCAL stats only, so it must stand
    aside inside the context or the documented mesh-width invariance
    silently breaks (review finding, round 3).  The forced fused path must
    produce the same mesh-width-invariant result as the unfused one."""
    from jax.sharding import Mesh

    from mdeical_image_segmentation_tpu.models import get_model
    from mdeical_image_segmentation_tpu.parallel.spatial import (
        spatial_sharded_apply,
    )

    model = get_model(
        {"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8,
         "num_levels": 2, "layer_order": "gcr"}
    )
    vol = jnp.asarray(
        np.random.RandomState(7).rand(1, 8, 256, 32, 1), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), vol[:, :, :32], False)
    mesh8 = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    old = os.environ.pop("TPUSEG_FUSED_CONV", None)
    try:
        os.environ["TPUSEG_FUSED_CONV"] = "off"
        ref = np.asarray(
            spatial_sharded_apply(model, variables, vol, mesh1, halo=16,
                                  shard_axis=2, cross_shard_norm=True)
        )
        os.environ["TPUSEG_FUSED_CONV"] = "interpret"
        out8 = np.asarray(
            spatial_sharded_apply(model, variables, vol, mesh8, halo=16,
                                  shard_axis=2, cross_shard_norm=True)
        )
    finally:
        if old is None:
            os.environ.pop("TPUSEG_FUSED_CONV", None)
        else:
            os.environ["TPUSEG_FUSED_CONV"] = old

    np.testing.assert_allclose(out8, ref, rtol=2e-5, atol=2e-6)
