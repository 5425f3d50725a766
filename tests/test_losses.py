"""Loss registry tests: torch oracles for the cross-framework-trap losses,
hand-computed values for the dice family, and factory/wrapper composition
parity (reference losses.py:273-306 dispatch rules)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mdeical_image_segmentation_tpu.losses import (
    BCEDiceLoss,
    BCEWithLogitsLoss,
    CrossEntropyLoss,
    DiceLoss,
    GeneralizedDiceLoss,
    MaskingLossWrapper,
    SkipLastTargetChannelWrapper,
    SmoothL1Loss,
    WeightedCrossEntropyLoss,
    WeightedSmoothL1Loss,
    compute_per_channel_dice,
    f1_loss,
    get_loss_criterion,
    iou_loss,
)

RS = np.random.RandomState(0)


def _logits(shape):
    return RS.randn(*shape).astype(np.float32)


def _binary(shape):
    return (RS.rand(*shape) > 0.5).astype(np.float32)


class TestBCE:
    def test_matches_torch(self):
        x, t = _logits((2, 8, 8, 1)), _binary((2, 8, 8, 1))
        ours = float(BCEWithLogitsLoss()(jnp.asarray(x), jnp.asarray(t)))
        ref = float(F.binary_cross_entropy_with_logits(torch.from_numpy(x), torch.from_numpy(t)))
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_pos_weight(self):
        x, t = _logits((2, 4, 4, 1)), _binary((2, 4, 4, 1))
        ours = float(BCEWithLogitsLoss(pos_weight=3.0)(jnp.asarray(x), jnp.asarray(t)))
        ref = float(
            F.binary_cross_entropy_with_logits(
                torch.from_numpy(x), torch.from_numpy(t),
                pos_weight=torch.tensor(3.0),
            )
        )
        assert ours == pytest.approx(ref, abs=1e-6)


class TestDiceFamily:
    def test_per_channel_dice_hand_value(self):
        # probs = target = all ones → dice = 2*n/(n+n) = 1
        p = jnp.ones((1, 4, 4, 2))
        t = jnp.ones((1, 4, 4, 2))
        np.testing.assert_allclose(np.asarray(compute_per_channel_dice(p, t)), [1.0, 1.0], rtol=1e-6)

    def test_squared_denominator(self):
        # V-Net extension: probs 0.5 everywhere, target ones:
        # dice = 2*(0.5n)/(0.25n + n) = 0.8
        n = 16
        p = jnp.full((1, 4, 4, 1), 0.5)
        t = jnp.ones((1, 4, 4, 1))
        np.testing.assert_allclose(np.asarray(compute_per_channel_dice(p, t)), [0.8], rtol=1e-6)

    def test_dice_loss_normalizations(self):
        x = _logits((2, 8, 8, 3))
        t = _binary((2, 8, 8, 3))
        for norm in ["sigmoid", "softmax", "none"]:
            v = float(DiceLoss(normalization=norm)(jnp.asarray(x), jnp.asarray(t)))
            assert np.isfinite(v)

    def test_gdl_single_channel_expands(self):
        x, t = _logits((2, 8, 8, 1)), _binary((2, 8, 8, 1))
        v = float(GeneralizedDiceLoss()(jnp.asarray(x), jnp.asarray(t)))
        assert 0.0 <= v <= 1.0

    def test_bcedice_combination(self):
        x, t = _logits((1, 8, 8, 1)), _binary((1, 8, 8, 1))
        xa, ta = jnp.asarray(x), jnp.asarray(t)
        v = float(BCEDiceLoss(alpha=2.0, beta=0.5)(xa, ta))
        expect = 2.0 * float(BCEWithLogitsLoss()(xa, ta)) + 0.5 * float(DiceLoss()(xa, ta))
        assert v == pytest.approx(expect, rel=1e-6)


class TestCrossEntropy:
    def test_matches_torch(self):
        x = _logits((2, 6, 6, 4))
        t = RS.randint(0, 4, (2, 6, 6)).astype(np.int64)
        ours = float(CrossEntropyLoss()(jnp.asarray(x), jnp.asarray(t)))
        ref = float(
            F.cross_entropy(
                torch.from_numpy(np.moveaxis(x, -1, 1).copy()), torch.from_numpy(t)
            )
        )
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_ignore_index_and_weight_match_torch(self):
        x = _logits((2, 5, 5, 3))
        t = RS.randint(0, 3, (2, 5, 5)).astype(np.int64)
        t[0, :2] = -100
        w = np.array([0.2, 1.0, 3.0], np.float32)
        ours = float(
            CrossEntropyLoss(weight=w, ignore_index=-100)(jnp.asarray(x), jnp.asarray(t))
        )
        ref = float(
            F.cross_entropy(
                torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
                torch.from_numpy(t),
                weight=torch.from_numpy(w),
                ignore_index=-100,
            )
        )
        assert ours == pytest.approx(ref, abs=1e-5)

    def test_wce_runs(self):
        x = _logits((1, 4, 4, 3))
        t = RS.randint(0, 3, (1, 4, 4))
        assert np.isfinite(float(WeightedCrossEntropyLoss()(jnp.asarray(x), jnp.asarray(t))))


class TestRegression:
    def test_smooth_l1_matches_torch(self):
        x, t = _logits((2, 7, 7, 1)), _logits((2, 7, 7, 1))
        ours = float(SmoothL1Loss()(jnp.asarray(x), jnp.asarray(t)))
        ref = float(F.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(t)))
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_weighted_smooth_l1(self):
        x = np.zeros((1, 2, 2, 1), np.float32)
        t = np.array([0.1, 0.9, 0.2, 0.8], np.float32).reshape(1, 2, 2, 1)
        loss = WeightedSmoothL1Loss(threshold=0.5, initial_weight=0.0)
        # below-threshold targets weighted to 0 → only 0.9/0.8 contribute
        v = float(loss(jnp.asarray(x), jnp.asarray(t)))
        expect = (0.5 * 0.9**2 + 0.5 * 0.8**2) / 4
        assert v == pytest.approx(expect, rel=1e-5)


class TestHybrid2D:
    def test_f1_iou_hand_values(self):
        # logits large-positive everywhere → probs≈1; target all ones →
        # perfect scores → both losses ≈ 0
        x = jnp.full((1, 8, 8, 1), 20.0)
        t = jnp.ones((1, 8, 8, 1))
        assert float(f1_loss(x, t)) == pytest.approx(0.0, abs=1e-4)
        assert float(iou_loss(x, t)) == pytest.approx(0.0, abs=1e-4)


class TestFactory:
    def test_registry_dispatch(self):
        for name in [
            "BCEWithLogitsLoss", "BCEDiceLoss", "CrossEntropyLoss",
            "WeightedCrossEntropyLoss", "GeneralizedDiceLoss", "DiceLoss",
            "MSELoss", "SmoothL1Loss", "L1Loss",
        ]:
            loss = get_loss_criterion({"loss": {"name": name}})
            assert callable(loss)

    def test_unknown_raises(self):
        with pytest.raises(RuntimeError):
            get_loss_criterion({"loss": {"name": "Nope"}})

    def test_masking_wrapper_composition(self):
        loss = get_loss_criterion(
            {"loss": {"name": "DiceLoss", "ignore_index": -1}}
        )
        assert isinstance(loss, MaskingLossWrapper)

    def test_ce_keeps_native_ignore_index(self):
        loss = get_loss_criterion(
            {"loss": {"name": "CrossEntropyLoss", "ignore_index": -1}}
        )
        assert isinstance(loss, CrossEntropyLoss)
        assert loss.ignore_index == -1

    def test_skip_last_target(self):
        loss = get_loss_criterion(
            {"loss": {"name": "DiceLoss", "skip_last_target": True}}
        )
        assert isinstance(loss, SkipLastTargetChannelWrapper)
        x = jnp.asarray(_logits((1, 4, 4, 2)))
        t = jnp.asarray(_binary((1, 4, 4, 3)))
        inner = DiceLoss()(x, t[..., :-1])
        assert float(loss(x, t)) == pytest.approx(float(inner), rel=1e-6)


class TestJittedTraining:
    @pytest.mark.slow  # ~3 min of CPU compile at the MS-SSIM-minimum 192²;
    # guards a linearization regression in rarely-touched ops — /verify +
    # nightly run the slow tier
    def test_jit_grad_segmentation_loss_through_bn_model(self):
        """Regression: jit(value_and_grad) of the hybrid loss through a
        BatchNorm UNet-3+ must compile (a traced reduce_window init value
        once broke reverse-mode linearization under jit)."""
        import jax
        import optax

        from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel

        model = UNetModel(
            UNetConfig(in_channels=1, out_channels=1, unet_type="UNet_3Plus",
                       compute_dtype="bfloat16")
        )
        x = jnp.asarray(RS.rand(1, 192, 192, 1), jnp.float32)
        t = (x > 0.5).astype(jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)
        opt = optax.adamw(1e-3)
        ost = opt.init(v["params"])

        def step(params, bs, ost):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, t, train=True,
                    mutable=["batch_stats"],
                )
                return out.loss, mut["batch_stats"]

            (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, ost = opt.update(grads, ost, params)
            return optax.apply_updates(params, u), nbs, ost, loss

        out = jax.jit(step)(v["params"], v["batch_stats"], ost)
        assert np.isfinite(float(out[3]))


class TestSegmentationLoss3DRegistry:
    def test_z_squeeze_5d_input_accepted(self):
        """The 3D trainer's z-squeeze path hands losses (N, 1, H, W, C);
        SegmentationLoss must squeeze the singleton depth instead of feeding
        an H=1 'image' to ms_ssim (round-3 review finding)."""
        from mdeical_image_segmentation_tpu.losses.losses3d import (
            SegmentationLoss,
            get_loss_criterion,
        )

        rng = np.random.RandomState(0)
        logits5 = jnp.asarray(rng.randn(1, 1, 176, 176, 1), jnp.float32)
        target5 = jnp.asarray(
            (rng.rand(1, 1, 176, 176, 1) > 0.5), jnp.float32
        )
        loss = SegmentationLoss()(logits5, target5)
        ref = SegmentationLoss()(logits5[:, 0], target5[:, 0])
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(float(loss), float(ref), rtol=1e-6)
        # registry dispatch reaches the same class
        crit = get_loss_criterion({"loss": {"name": "SegmentationLoss"}})
        np.testing.assert_allclose(
            float(crit(logits5, target5)), float(ref), rtol=1e-6
        )

    def test_true_3d_rejected_clearly(self):
        from mdeical_image_segmentation_tpu.losses.losses3d import (
            SegmentationLoss,
        )

        x = jnp.zeros((1, 4, 176, 176, 1))
        with pytest.raises(ValueError, match="2D"):
            SegmentationLoss()(x, x)
