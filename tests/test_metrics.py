"""Metric parity tests: the quirky mean-threshold eval of the reference
(trainer/metrcis.py:153-168), hand-checked IoU/Dice values, and the
surface-distance metrics (HD95/ASD medpy replacements)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdeical_image_segmentation_tpu.metrics import (
    calculate_metric_percase,
    compute_dice,
    compute_iou,
    compute_metrics,
    dice_jax,
    hd95,
    asd,
    iou_jax,
)


class TestIoUDice:
    def test_perfect_prediction(self):
        m = np.zeros((2, 8, 8), np.float32)
        m[:, 2:6, 2:6] = 1.0
        assert compute_iou(m, m) == pytest.approx(1.0)
        assert compute_dice(m, m) == pytest.approx(1.0, abs=1e-4)

    def test_hand_value(self):
        # pred covers 4 px, label covers 8 px, overlap 4 → IoU 0.5, Dice 2/3
        pred = np.zeros((1, 4, 4), np.float32)
        pred[0, 0, :] = 1.0
        lab = np.zeros((1, 4, 4), np.float32)
        lab[0, 0:2, :] = 1.0
        assert compute_iou(pred, lab) == pytest.approx(0.5, abs=1e-5)
        assert compute_dice(pred, lab) == pytest.approx(2 / 3, abs=1e-4)

    def test_compute_metrics_mean_threshold(self):
        # logits: half strongly positive, half strongly negative → sigmoid
        # mean ≈ 0.5, threshold separates exactly like the labels
        logits = np.zeros((2, 8, 8, 1), np.float32)
        logits[:, :4] = 10.0
        logits[:, 4:] = -10.0
        labels = (logits > 0).astype(np.float32)
        out = compute_metrics(logits, labels)
        assert out["iou"] == pytest.approx(1.0, abs=1e-5)
        assert out["dice"] == pytest.approx(1.0, abs=1e-4)

    def test_channel_layouts(self):
        logits = np.random.RandomState(0).randn(2, 8, 8, 1).astype(np.float32)
        labels = (np.random.RandomState(1).rand(2, 8, 8, 1) > 0.5).astype(np.float32)
        a = compute_metrics(logits, labels, threshold=0.5)
        b = compute_metrics(
            np.moveaxis(logits, -1, 1), np.moveaxis(labels, -1, 1), threshold=0.5
        )
        assert a == b

    def test_jax_variants_match_numpy(self):
        logits = np.random.RandomState(2).randn(3, 16, 16).astype(np.float32)
        labels = (np.random.RandomState(3).rand(3, 16, 16) > 0.5).astype(np.float32)
        ref = compute_metrics(logits[..., None], labels[..., None])
        assert float(iou_jax(jnp.asarray(logits), jnp.asarray(labels))) == pytest.approx(ref["iou"], abs=1e-5)
        assert float(dice_jax(jnp.asarray(logits), jnp.asarray(labels))) == pytest.approx(ref["dice"], abs=1e-5)


class TestSurface:
    def test_identical_masks_zero_distance(self):
        m = np.zeros((16, 16), bool)
        m[4:12, 4:12] = True
        assert hd95(m, m) == 0.0
        assert asd(m, m) == 0.0

    def test_shifted_square(self):
        a = np.zeros((32, 32), bool)
        b = np.zeros((32, 32), bool)
        a[8:16, 8:16] = True
        b[10:18, 8:16] = True  # shifted 2 px down
        d = hd95(a, b)
        assert 1.0 <= d <= 2.5
        assert 0.0 < asd(a, b) <= 2.0

    def test_calculate_metric_percase(self):
        m = np.zeros((16, 16), np.uint8)
        m[4:12, 4:12] = 1
        dice, jac, hd, a = calculate_metric_percase(m, m)
        assert dice == 1.0 and jac == 1.0 and hd == 0.0 and a == 0.0
