"""2D model family: output shapes/contracts for all four variants, wrapper
loss selection, deep-supervision loss summation, save/load round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.models import (
    UNet,
    UNetConfig,
    UNetModel,
    UNet3Plus,
    UNet3PlusDeepSup,
    UNet3PlusDeepSupCGM,
)


def _param_count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


class TestClassicUNet:
    def test_shape(self, rng):
        m = UNet(in_channels=3, out_channels=2, base_features=8)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(rng, x)
        y = m.apply(v, x)
        assert y.shape == (1, 64, 64, 2)

    def test_full_width_param_count(self, rng):
        # Golden vs torch: reference UNet(3,1) has 31,031,745 parameters
        # (verified by instantiating /root/reference/model/unet2d/unet.py:42).
        m = UNet(in_channels=3, out_channels=1, base_features=64)
        v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3))), rng)
        assert _param_count(v["params"]) == 31_031_745


class TestUNet3PlusFamily:
    @pytest.mark.parametrize("cls", [UNet3Plus, UNet3PlusDeepSup, UNet3PlusDeepSupCGM])
    def test_shapes(self, rng, cls):
        m = cls(in_channels=1, n_classes=1)
        x = jnp.zeros((1, 64, 64, 1))
        v = jax.eval_shape(
            lambda k: m.init(k, jnp.zeros((1, 64, 64, 1)), True), rng
        )
        out = jax.eval_shape(
            lambda p: m.apply(p, x, False), v
        )
        if cls is UNet3Plus:
            assert out.shape == (1, 64, 64, 1)
        else:
            assert len(out) == 5
            for d in out:
                assert d.shape == (1, 64, 64, 1)

    def test_unet3plus_param_count(self, rng):
        # Golden vs torch: reference UNet_3Plus(3,1) has 26,971,777 params +
        # 13,056 BN running stats (verified against unet.py:136).
        m = UNet3Plus(in_channels=3, n_classes=1)
        v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), True), rng)
        assert _param_count(v["params"]) == 26_971_777
        assert _param_count(v["batch_stats"]) == 13_056


class TestWrapper:
    def test_deepsup_loss_is_sum_over_heads(self, rng):
        cfg = UNetConfig(in_channels=1, out_channels=1, unet_type="UNet_3Plus_DeepSup")
        model = UNetModel(cfg)
        # 192²: the hybrid loss's 5-level MS-SSIM needs min spatial dim
        # ≥ 11·2⁴ = 176, so this compile can't be shrunk much further
        x = jnp.asarray(np.random.RandomState(0).rand(1, 192, 192, 1), jnp.float32)
        t = (jnp.ones((1, 192, 192, 1)) * (x[..., :1] > 0.5)).astype(jnp.float32)
        v = model.init(rng, x)
        out, _ = model.apply(v, x, t, train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        # 5 heads, each loss in (0, 3]; sum must exceed any single head's loss
        single = model.criterion(out.logits, t)
        assert float(out.loss) > float(single)

    def test_unet_loss_selection(self):
        assert UNetModel(UNetConfig(out_channels=1, unet_type="UNet")).criterion.__name__ == "bce_with_logits"
        assert UNetModel(UNetConfig(out_channels=3, unet_type="UNet")).criterion.__name__ == "cross_entropy"

    def test_save_load_roundtrip(self, rng, tmp_path):
        cfg = UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=4)
        model = UNetModel(cfg)
        x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 1), jnp.float32)
        v = model.init(rng, x)
        model.save_pretrained(str(tmp_path / "m"), v)
        model2, v2 = UNetModel.from_pretrained(str(tmp_path / "m"))
        assert model2.config.unet_type == "UNet"
        y1 = model.apply(v, x).logits
        y2 = model2.apply(v2, x).logits
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0)

    def test_cgm_returns_probabilities(self, rng):
        cfg = UNetConfig(in_channels=1, out_channels=1, unet_type="UNet_3Plus_DeepSup_CGM")
        model = UNetModel(cfg)
        x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 1), jnp.float32)
        v = model.init(rng, x)
        out = model.apply(v, x, None, train=False)
        probs = np.asarray(out.logits)
        assert probs.min() >= 0.0 and probs.max() <= 1.0
