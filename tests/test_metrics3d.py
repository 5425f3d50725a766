"""3D eval metric registry: hand-checked values for MeanIoU/DiceCoefficient,
adapted-Rand correctness on known segmentations, AP instance matching, and
registry dispatch."""

import numpy as np
import pytest

import jax.numpy as jnp

from mdeical_image_segmentation_tpu.metrics import (
    Accuracy,
    AveragePrecision,
    BoundaryAdaptedRandError,
    DiceCoefficient,
    MeanIoU,
    MSE,
    PSNR,
    SegmentationMetrics,
    adapted_rand_error,
    contingency_table,
    get_evaluation_metric,
)


class TestDiceCoefficient:
    def test_perfect(self):
        p = jnp.ones((1, 4, 4, 4, 2))
        assert float(DiceCoefficient()(p, p)) == pytest.approx(1.0, rel=1e-5)

    def test_half_probs(self):
        p = jnp.full((1, 4, 4, 4, 1), 0.5)
        t = jnp.ones((1, 4, 4, 4, 1))
        # V-Net squared denominator: 2*0.5/(0.25+1) = 0.8
        assert float(DiceCoefficient()(p, t)) == pytest.approx(0.8, rel=1e-5)


class TestMeanIoU:
    def test_binary_hand_value(self):
        p = np.zeros((1, 2, 4, 4, 1), np.float32)
        p[0, :, :2] = 0.9  # predicted fg: top half
        t = np.zeros((1, 2, 4, 4, 1), np.float32)
        t[0, :, :, :2] = 1.0  # true fg: left half → IoU = 8/24 per z... global
        # pred 16 voxels, true 16 voxels, overlap 8 → IoU 8/24 = 1/3
        assert MeanIoU()(p, t) == pytest.approx(1 / 3, rel=1e-5)

    def test_multiclass_onehot_expansion(self):
        # 2-class: argmax channel wins
        p = np.zeros((1, 2, 2, 2, 2), np.float32)
        p[..., 0] = 0.8
        p[0, 0, 0, 0, 1] = 0.9  # one voxel class 1
        t = np.zeros((1, 2, 2, 2), np.int32)
        t[0, 0, 0, 0] = 1
        assert MeanIoU()(p, t) == pytest.approx(1.0, rel=1e-5)

    def test_skip_channels(self):
        p = np.zeros((1, 2, 2, 2, 2), np.float32)
        p[..., 1] = 1.0
        t = np.zeros((1, 2, 2, 2), np.int32) + 1
        v = MeanIoU(skip_channels=(0,))(p, t)
        assert v == pytest.approx(1.0)


class TestAdaptedRand:
    def test_identical_segmentations(self):
        seg = np.zeros((4, 8, 8), np.int32)
        seg[:, :4] = 1
        seg[:, 4:] = 2
        are, prec, rec = adapted_rand_error(seg, seg)
        assert are == pytest.approx(0.0, abs=1e-9)
        assert prec == pytest.approx(1.0) and rec == pytest.approx(1.0)

    def test_split_is_penalized(self):
        gt = np.ones((4, 8, 8), np.int32)
        seg = np.ones((4, 8, 8), np.int32)
        seg[:, 4:] = 2  # over-segmentation
        are, prec, rec = adapted_rand_error(gt, seg)
        assert are > 0.2
        assert prec == pytest.approx(1.0)  # split hurts recall, not precision

    def test_boundary_arand_metric(self):
        # boundary pmap of a two-object image → metric near 0
        target = np.zeros((1, 4, 16, 16, 1), np.float32)
        target[0, :, :, 8:] = 2.0
        target[0, :, :, :8] = 1.0
        boundary = np.zeros((1, 4, 16, 16, 1), np.float32)
        boundary[0, :, :, 7:9] = 1.0  # predicted boundary at the split
        m = BoundaryAdaptedRandError(thresholds=[0.5], use_last_target=True)
        v = m(boundary, target)
        assert v < 0.3  # boundary voxels themselves cost a little ARand


class TestInstanceMetrics:
    def _segs(self):
        gt = np.zeros((16, 16), np.int32)
        gt[2:7, 2:7] = 1
        gt[9:14, 9:14] = 2
        seg = np.zeros((16, 16), np.int32)
        seg[2:7, 2:7] = 5  # perfect match, different id
        seg[9:13, 9:13] = 9  # partial match (16/25 IoU = 0.64... )
        return gt, seg

    def test_accuracy_thresholds(self):
        gt, seg = self._segs()
        assert Accuracy(0.5)(seg, gt) == pytest.approx(1.0)  # both > 0.5 IoU
        # at 0.9 only the exact square counts: tp=1, fn=1, fp=1 → 1/3
        assert Accuracy(0.9)(seg, gt) == pytest.approx(1 / 3)

    def test_average_precision_range(self):
        gt, seg = self._segs()
        ap = AveragePrecision()(seg, gt)
        assert 0.3 < ap <= 1.0

    def test_contingency_table(self):
        a = np.array([[0, 0], [1, 1]])
        b = np.array([[0, 1], [1, 1]])
        ct = contingency_table(a, b)
        assert ct.shape == (2, 2)
        assert ct.sum() == 4
        assert ct[1, 1] == 2  # both fg


class TestSimpleMetrics:
    def test_psnr_identical(self):
        x = np.random.RandomState(0).rand(8, 8).astype(np.float32)
        assert PSNR()(x, x) > 100

    def test_mse(self):
        a = np.zeros((4, 4))
        b = np.ones((4, 4))
        assert MSE()(a, b) == pytest.approx(1.0)


def test_registry_dispatch():
    m = get_evaluation_metric({"eval_metric": {"name": "MeanIoU"}})
    assert isinstance(m, MeanIoU)
    m = get_evaluation_metric(
        {"eval_metric": {"name": "BoundaryAdaptedRandError", "thresholds": [0.4]}}
    )
    assert m.thresholds == [0.4]
    with pytest.raises(KeyError):
        get_evaluation_metric({"eval_metric": {"name": "Bogus"}})


def test_filter_instances_does_not_mutate_caller_arrays():
    """convert_to_numpy is a no-copy np.asarray (the reference's .cpu()
    always copied from CUDA), so instance filtering must copy before
    zeroing small labels — pre-fix a second metric call saw corrupted
    ground truth (round-3 review finding)."""
    from mdeical_image_segmentation_tpu.metrics.metrics3d import (
        GenericAveragePrecision,
    )

    m = GenericAveragePrecision(min_instance_size=10)
    seg = np.zeros((8, 8, 8), np.int64)
    seg[:2, :2, :2] = 1   # 8 voxels — below min size, filtered to 0
    seg[4:, 4:, 4:] = 2   # 64 voxels — kept
    original = seg.copy()
    out = m._filter_instances(seg)
    np.testing.assert_array_equal(seg, original)  # caller array untouched
    assert (out[:2, :2, :2] == 0).all() and (out[4:, 4:, 4:] == 2).all()
