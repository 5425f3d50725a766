"""3D model family: shape contracts, torch-golden parameter counts, order
strings, SE blocks, wrapper activation-before-loss parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.models import (
    MODELS_3D,
    ResNetBlock,
    SingleConv,
    UNet3DConfig,
    UNet3DForMedicalSegmentation,
    get_model,
    number_of_features_per_level,
)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_f_maps_progression():
    assert number_of_features_per_level(64, 4) == [64, 128, 256, 512]


# Golden parameter counts verified against the torch reference models
# (/root/reference/model/unet3d/model.py instantiated with the same configs).
GOLDEN = {
    "UNet3D": (dict(in_channels=1, out_channels=2, f_maps=8, num_levels=4), (1, 16, 16, 16, 1), 255_688),
    "ResidualUNet3D": (dict(in_channels=1, out_channels=2, f_maps=8, num_levels=5), (1, 32, 32, 32, 1), 1_778_642),
    "ResidualUNetSE3D": (dict(in_channels=1, out_channels=2, f_maps=8, num_levels=5), (1, 32, 32, 32, 1), 1_834_283),
    "UNet2D": (dict(in_channels=3, out_channels=1, f_maps=8, num_levels=4), (1, 16, 16, 3), 85_763),
    "ResidualUNet2D": (dict(in_channels=3, out_channels=1, f_maps=8, num_levels=5), (1, 32, 32, 3), 601_305),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_param_count_matches_torch_reference(rng, name):
    kw, shape, expected = GOLDEN[name]
    m = get_model({"name": name, **kw})
    v = jax.eval_shape(lambda k: m.init(k, jnp.zeros(shape), True), rng)
    assert _count(v["params"]) == expected


@pytest.mark.parametrize("name", ["UNet3D", "ResidualUNet3D"])
def test_forward_shapes(rng, name):
    m = get_model(
        {"name": name, "in_channels": 1, "out_channels": 2, "f_maps": 8,
         "num_levels": 3}
    )
    x = jnp.zeros((2, 16, 16, 16, 1))
    v = m.init(rng, x, True)
    y = m.apply(v, x, False)
    assert y.shape == (2, 16, 16, 16, 2)
    assert y.dtype == jnp.float32


def test_forward_returns_logits_not_probs(rng):
    """Parity quirk: final activation constructed but never applied in
    forward (reference model.py:145-151)."""
    m = get_model({"name": "UNet3D", "in_channels": 1, "out_channels": 1, "f_maps": 8})
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 1) * 10, jnp.float32)
    v = m.init(rng, x, True)
    y = np.asarray(m.apply(v, x, False))
    assert y.min() < 0 or y.max() > 1  # logits, not squashed
    act = m.final_activation()
    assert act is jax.nn.sigmoid


class TestSingleConv:
    @pytest.mark.parametrize("order", ["gcr", "cbrd", "cge", "cl", "crg", "cbrD"])
    def test_orders(self, rng, order):
        m = SingleConv(out_channels=16, order=order, is3d=True)
        x = jnp.zeros((1, 8, 8, 8, 8))
        v = m.init({"params": rng, "dropout": rng}, x, True)
        y = m.apply(v, x, True, rngs={"dropout": rng},
                    mutable=["batch_stats"] if "b" in order else False)
        y0 = y[0] if isinstance(y, tuple) else y
        assert y0.shape == (1, 8, 8, 8, 16)

    def test_bias_only_without_norm(self, rng):
        x = jnp.zeros((1, 8, 8, 8, 4))
        v_norm = SingleConv(out_channels=16, order="gcr").init(rng, x)
        v_plain = SingleConv(out_channels=16, order="cr").init(rng, x)
        flat_norm = jax.tree_util.tree_leaves_with_path(v_norm["params"])
        assert not any("bias" in str(p) and "Conv" in str(p) for p, _ in flat_norm)
        flat_plain = jax.tree_util.tree_leaves_with_path(v_plain["params"])
        assert any("bias" in str(p) for p, _ in flat_plain)

    def test_group_clamp_small_channels(self, rng):
        # channels (4) < num_groups (8) → one group (reference :81-86)
        m = SingleConv(out_channels=4, order="cgr", num_groups=8)
        x = jnp.zeros((1, 8, 8, 8, 4))
        v = m.init(rng, x)
        m.apply(v, x)

    def test_invalid_order_raises(self, rng):
        with pytest.raises(AssertionError):
            SingleConv(out_channels=4, order="rgb").init(rng, jnp.zeros((1, 4, 4, 4, 2)))


def test_resnet_block_residual_path(rng):
    m = ResNetBlock(out_channels=8, order="cge")
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 8, 8), jnp.float32)
    v = m.init(rng, x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    # same channels → no conv1 shortcut parameters
    assert "conv1" not in v["params"]


class TestWrapper3D:
    def test_activated_logits_and_loss(self, rng):
        cfg = UNet3DConfig(
            in_channels=1, out_channels=1, f_maps=8, unet_type="UNet3D",
            loss_config={"loss": {"name": "BCEDiceLoss"}},
        )
        model = UNet3DForMedicalSegmentation(cfg)
        x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 16, 1), jnp.float32)
        t = (x > 0.5).astype(jnp.float32)
        v = model.init(rng, x)
        out = model.apply(v, x, t, train=True, rngs={"dropout": rng})
        probs = np.asarray(out.logits)
        assert 0.0 <= probs.min() and probs.max() <= 1.0  # activated output
        assert np.isfinite(float(out.loss))

    def test_save_load_roundtrip(self, rng, tmp_path):
        cfg = UNet3DConfig(in_channels=1, out_channels=1, f_maps=8, unet_type="UNet3D")
        model = UNet3DForMedicalSegmentation(cfg)
        x = jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 16, 1), jnp.float32)
        v = model.init(rng, x)
        model.save_pretrained(str(tmp_path / "m3d"), v)
        model2, v2 = UNet3DForMedicalSegmentation.from_pretrained(str(tmp_path / "m3d"))
        y1 = model.apply(v, x).logits
        y2 = model2.apply(v2, x).logits
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))

    def test_pixelwise_loss_with_weight(self, rng):
        cfg = UNet3DConfig(
            in_channels=1, out_channels=3, f_maps=8, unet_type="UNet3D",
            final_sigmoid=False, activate_before_loss=False,
            loss_config={"loss": {"name": "PixelWiseCrossEntropyLoss"}},
        )
        model = UNet3DForMedicalSegmentation(cfg)
        x = jnp.asarray(np.random.RandomState(4).rand(1, 16, 16, 16, 1), jnp.float32)
        t = jnp.asarray(np.random.RandomState(5).randint(0, 3, (1, 16, 16, 16)))
        w = jnp.ones((1, 16, 16, 16))
        v = model.init(rng, x)
        out = model.apply(v, x, t, w, train=True, rngs={"dropout": rng})
        assert np.isfinite(float(out.loss))


def test_registry_contents():
    for name in ["UNet3D", "ResidualUNet3D", "ResidualUNetSE3D", "UNet2D", "ResidualUNet2D"]:
        assert name in MODELS_3D


def test_wrapper_forwards_conv_and_pool_kernel_size(rng):
    """UNet3DConfig.conv_kernel_size / pool_kernel_size must reach the built
    module — pre-fix the wrapper silently dropped both, so config.json
    misdescribed the weights (round-3 review finding)."""
    cfg = UNet3DConfig(
        in_channels=1, out_channels=1, f_maps=4, num_levels=2, num_groups=1,
        conv_kernel_size=5, pool_kernel_size=(1, 2, 2), conv_padding=2,
        unet_type="UNet3D",
    )
    model = UNet3DForMedicalSegmentation(cfg)
    assert model.module.conv_kernel_size == 5
    assert model.module.pool_kernel_size == (1, 2, 2)
    x = jnp.zeros((1, 4, 16, 16, 1), jnp.float32)
    variables = model.module.init(rng, x, train=False)
    k = jax.tree_util.tree_leaves_with_path(variables["params"])
    k5 = [p for p, v in k if v.ndim == 5 and v.shape[0] == 5]
    assert k5, "no 5x5x5 conv kernels found — conv_kernel_size was dropped"
