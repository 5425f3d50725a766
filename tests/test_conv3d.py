"""Slab-decomposed 3D conv (ops/conv3d.py): numerics, autodiff, and
param-tree compatibility with the native nn.Conv path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from mdeical_image_segmentation_tpu.ops import conv3d


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


DN3 = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


def _native(x, w, padding):
    pads = conv3d._pad_pairs(padding, tuple(w.shape[:3]))
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), pads, dimension_numbers=DN3
    )


@pytest.mark.parametrize(
    "kshape,padding",
    [
        ((3, 3, 3, 4, 8), "SAME"),
        ((3, 3, 3, 4, 8), [(1, 1), (1, 1), (1, 1)]),
        ((3, 3, 3, 4, 8), "VALID"),
        ((1, 1, 1, 4, 8), "SAME"),
        ((3, 1, 1, 4, 8), [(1, 1), (0, 0), (0, 0)]),
    ],
)
def test_matches_native_conv(kshape, padding):
    x = _rand((2, 5, 6, 7, kshape[3]))
    w = _rand(kshape, seed=1) * 0.1
    got = conv3d.slab_conv3d(x, w, padding=padding)
    want = _native(x, w, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_match_native():
    x = _rand((1, 4, 5, 5, 3))
    w = _rand((3, 3, 3, 3, 6), seed=2) * 0.1

    def f_slab(x, w):
        return jnp.sum(jnp.square(conv3d.slab_conv3d(x, w, padding="SAME")))

    def f_nat(x, w):
        return jnp.sum(jnp.square(_native(x, w, "SAME")))

    gx1, gw1 = jax.grad(f_slab, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_nat, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw1, gw2, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "ci,co,padding",
    [(96, 32, "SAME"), (8, 16, "SAME"), (6, 4, "VALID"), (9, 2, (1, 0, 2))],
)
def test_custom_vjp_grads_match_autodiff(ci, co, padding, monkeypatch):
    """The layout-aware custom VJP (TPUSEG_SLAB_VJP, PERF.md round 3) must
    reproduce autodiff's gradients for both dW forms (A: slice-x when Ci
    small; B: fixed x frame + shifted cotangent when 3·Co < 2·Ci)."""
    x = _rand((2, 5, 8, 9, ci))
    w = _rand((3, 3, 3, ci, co), seed=3) * 0.1
    gy = None

    def grads(mode):
        nonlocal gy
        monkeypatch.setenv("TPUSEG_SLAB_VJP", mode)
        conv3d._slab_custom_fn.cache_clear()
        y, vjp = jax.vjp(
            lambda x, w: conv3d.slab_conv3d(x, w, padding=padding), x, w
        )
        if gy is None:
            gy = _rand(y.shape, seed=4)
        return vjp(gy)

    gx_a, gw_a = grads("autodiff")
    gx_c, gw_c = grads("custom")
    conv3d._slab_custom_fn.cache_clear()
    np.testing.assert_allclose(gx_c, gx_a, rtol=1e-5, atol=1e-5)
    # form B reassociates the dW contraction (fixed frame + shifted
    # cotangent): identical addends, different order ⇒ fp32 noise ~1e-5
    # absolute on O(50) magnitudes
    np.testing.assert_allclose(gw_c, gw_a, rtol=1e-3, atol=1e-4)


def test_slab_vjp_env_knob_strict(monkeypatch):
    monkeypatch.setenv("TPUSEG_SLAB_VJP", "bogus")
    with pytest.raises(ValueError, match="TPUSEG_SLAB_VJP"):
        conv3d.slab_conv3d(
            _rand((1, 4, 4, 4, 2)), _rand((3, 3, 3, 2, 2), seed=5)
        )


def test_bias_applied():
    x = _rand((1, 3, 4, 4, 2))
    w = _rand((3, 3, 3, 2, 5), seed=3) * 0.1
    b = _rand((5,), seed=4)
    got = conv3d.slab_conv3d(x, w, b, padding="SAME")
    np.testing.assert_allclose(
        got, _native(x, w, "SAME") + b, rtol=1e-5, atol=1e-5
    )


def test_torchconv_slab_param_tree_and_output():
    """TorchConv's slab branch creates the identical Conv_0 param tree and
    the same outputs as the native branch."""
    from mdeical_image_segmentation_tpu.models.layers2d import TorchConv

    x = _rand((2, 4, 5, 6, 3))
    mod = TorchConv(8, (3, 3, 3), padding=[(1, 1), (1, 1), (1, 1)])

    old = os.environ.pop("TPUSEG_CONV3D", None)
    try:
        os.environ["TPUSEG_CONV3D"] = "native"
        v_nat = mod.init(jax.random.PRNGKey(0), x)
        y_nat = mod.apply(v_nat, x)
        os.environ["TPUSEG_CONV3D"] = "slab"
        v_slab = mod.init(jax.random.PRNGKey(0), x)
        y_slab = mod.apply(v_slab, x)
    finally:
        if old is None:
            os.environ.pop("TPUSEG_CONV3D", None)
        else:
            os.environ["TPUSEG_CONV3D"] = old

    flat_nat = jax.tree_util.tree_map(np.shape, v_nat)
    flat_slab = jax.tree_util.tree_map(np.shape, v_slab)
    assert flat_nat == flat_slab  # same names, same shapes
    # identical init streams => identical params => near-identical outputs
    np.testing.assert_allclose(y_slab, y_nat, rtol=1e-5, atol=1e-5)


def test_unet3d_pixel_output_unchanged_under_slab():
    """Whole-model check: UNet3D forward is unchanged (to fp32 tolerance)
    when the slab lowering is forced."""
    from mdeical_image_segmentation_tpu.models import get_model

    cfg = {"name": "UNet3D", "in_channels": 1, "out_channels": 2,
           "f_maps": 16, "num_levels": 2, "layer_order": "gcr"}
    x = _rand((1, 8, 16, 16, 1))

    old = os.environ.pop("TPUSEG_CONV3D", None)
    try:
        os.environ["TPUSEG_CONV3D"] = "native"
        model = get_model(dict(cfg))
        v = model.init(jax.random.PRNGKey(0), x, False)
        y_nat = model.apply(v, x, False)
        os.environ["TPUSEG_CONV3D"] = "slab"
        y_slab = model.apply(v, x, False)
    finally:
        if old is None:
            os.environ.pop("TPUSEG_CONV3D", None)
        else:
            os.environ["TPUSEG_CONV3D"] = old

    np.testing.assert_allclose(y_slab, y_nat, rtol=2e-4, atol=2e-4)


def test_strided_and_2d_convs_stay_native():
    assert not conv3d.use_slab((3, 3), (1, 1))
    assert not conv3d.use_slab((3, 3, 3), (2, 2, 2))


# ---------------------------------------------------------------------------
# slab ConvTranspose3D (ResidualUNet3D decoder geometry)
# ---------------------------------------------------------------------------


def _flax_deconv(x, w, strides, padding):
    import flax.linen as nn

    mod = nn.ConvTranspose(
        features=w.shape[-1], kernel_size=w.shape[:3], strides=strides,
        padding=padding, use_bias=False,
    )
    return mod.apply({"params": {"kernel": w}}, x)


@pytest.mark.parametrize(
    "kshape,strides,padding,inshape",
    [
        # the family geometry: k=3, stride 2, torch padding=1
        ((3, 3, 3, 4, 6), (2, 2, 2), [(1, 1)] * 3, (2, 4, 5, 6, 4)),
        # odd/mixed sizes and depth-1 edge case
        ((3, 3, 3, 2, 3), (2, 2, 2), [(1, 1)] * 3, (1, 1, 3, 3, 2)),
        ((3, 3, 3, 2, 3), (2, 2, 2), [(1, 1)] * 3, (1, 7, 2, 9, 2)),
        # other paddings/strides the lowering claims to support
        ((3, 3, 3, 2, 3), (2, 2, 2), "SAME", (1, 4, 4, 4, 2)),
        ((2, 2, 2, 2, 3), (2, 2, 2), [(0, 0)] * 3, (1, 3, 4, 4, 2)),
        ((3, 3, 3, 2, 3), (1, 2, 2), [(1, 1)] * 3, (1, 4, 4, 4, 2)),
        ((3, 3, 3, 2, 3), (3, 2, 2), [(1, 1)] * 3, (1, 4, 4, 4, 2)),
    ],
)
def test_transpose_matches_flax(kshape, strides, padding, inshape):
    x = _rand(inshape)
    w = _rand(kshape, seed=1) * 0.1
    got = conv3d.slab_conv_transpose3d(x, w, strides=strides, padding=padding)
    want = _flax_deconv(x, w, strides, padding)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_transpose_gradients_match_flax():
    x = _rand((1, 3, 4, 4, 3))
    w = _rand((3, 3, 3, 3, 5), seed=2) * 0.1
    pad = [(1, 1)] * 3

    def f_slab(x, w):
        return jnp.sum(jnp.square(conv3d.slab_conv_transpose3d(
            x, w, strides=(2, 2, 2), padding=pad)))

    def f_nat(x, w):
        return jnp.sum(jnp.square(_flax_deconv(x, w, (2, 2, 2), pad)))

    gx1, gw1 = jax.grad(f_slab, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_nat, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx1, gx2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw1, gw2, rtol=1e-4, atol=1e-4)


def test_slab_transpose_under_data_parallel_jit():
    """The slab deconv's (N·D) fold + phase-interleave reshapes must
    compile and match under GSPMD batch sharding on the 8-device mesh."""
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

    x = _rand((8, 3, 6, 6, 2))
    w = _rand((3, 3, 3, 2, 4), seed=7) * 0.1
    mesh = mesh_lib.make_mesh()

    want = conv3d.slab_conv_transpose3d(
        x, w, strides=(2, 2, 2), padding=[(1, 1)] * 3
    )
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
    got = jax.jit(
        lambda a: conv3d.slab_conv_transpose3d(
            a, w, strides=(2, 2, 2), padding=[(1, 1)] * 3
        )
    )(xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_residual_unet3d_output_unchanged_under_slab():
    """Whole-model check for the deconv family: ResidualUNet3D forward is
    unchanged (to fp32 tolerance) when the slab lowerings are forced."""
    from mdeical_image_segmentation_tpu.models import get_model

    cfg = {"name": "ResidualUNet3D", "in_channels": 1, "out_channels": 2,
           "f_maps": 16, "num_levels": 2, "layer_order": "gcr"}
    x = _rand((1, 8, 16, 16, 1))

    old = os.environ.pop("TPUSEG_CONV3D", None)
    try:
        os.environ["TPUSEG_CONV3D"] = "native"
        model = get_model(dict(cfg))
        v = model.init(jax.random.PRNGKey(0), x, False)
        y_nat = model.apply(v, x, False)
        os.environ["TPUSEG_CONV3D"] = "slab"
        v_slab = model.init(jax.random.PRNGKey(0), x, False)
        y_slab = model.apply(v_slab, x, False)
    finally:
        if old is None:
            os.environ.pop("TPUSEG_CONV3D", None)
        else:
            os.environ["TPUSEG_CONV3D"] = old

    # identical param trees (names + shapes) so checkpoints interchange
    assert jax.tree_util.tree_map(np.shape, v_slab) == (
        jax.tree_util.tree_map(np.shape, v)
    )
    np.testing.assert_allclose(y_slab, y_nat, rtol=2e-4, atol=2e-4)


def test_slab_conv_under_data_parallel_jit():
    """The (N, D, …) → (N·D, …) reshape merges a data-sharded batch dim;
    GSPMD must compile and match the unsharded result on the 8-device mesh."""
    from mdeical_image_segmentation_tpu.parallel import mesh as mesh_lib

    x = _rand((8, 4, 8, 8, 2))
    w = _rand((3, 3, 3, 2, 4), seed=5) * 0.1
    mesh = mesh_lib.make_mesh()

    want = conv3d.slab_conv3d(x, w, padding="SAME")
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh, x.ndim))
    got = jax.jit(lambda a: conv3d.slab_conv3d(a, w, padding="SAME"))(xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
