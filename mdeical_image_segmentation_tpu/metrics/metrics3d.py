"""Config-driven 3D evaluation metric registry.

Reference: /root/reference/model/unet3d/metrics.py (registry :430-445).
Layout note: the reference operates on NCDHW torch tensors; here all dense
inputs are **channels-last** (N, D, H, W, C) jax/numpy arrays and integer
targets are (N, D, H, W).  Device-friendly metrics (DiceCoefficient, MeanIoU,
PSNR, MSE) work on jnp arrays; the instance metrics (ARand/AP families) pull
to host numpy — they're inherently sequential (connected components).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..configs.registry import Registry
from ..losses.losses3d import compute_per_channel_dice
from ..logging_utils import get_logger
from ..transforms.skimage_compat import label as cc_label
from ..utils.onehot import expand_as_one_hot
from .seg_compat import adapted_rand_error, mean_squared_error, peak_signal_noise_ratio
from .seg_metrics import Accuracy, AveragePrecision

logger = get_logger("EvalMetric")

EVAL_METRICS = Registry("eval_metric")


def convert_to_numpy(*inputs):
    """Reference convert_to_numpy parity (model/unet3d/utils.py:257-272)."""
    return tuple(np.asarray(i) for i in inputs)


@EVAL_METRICS.register("DiceCoefficient")
class DiceCoefficient:
    """Mean per-channel dice on *probabilities* (reference metrics.py:15-29)."""

    def __init__(self, epsilon: float = 1e-6, **kwargs):
        self.epsilon = epsilon

    def __call__(self, input, target):
        import jax.numpy as jnp

        return jnp.mean(
            compute_per_channel_dice(
                jnp.asarray(input), jnp.asarray(target), epsilon=self.epsilon
            )
        )


@EVAL_METRICS.register("MeanIoU")
class MeanIoU:
    """Per-class IoU after argmax/threshold binarization, averaged over
    classes then batch (reference metrics.py:32-104)."""

    def __init__(self, skip_channels: Sequence[int] = (), ignore_index=None, **kwargs):
        self.ignore_index = ignore_index
        self.skip_channels = skip_channels

    def __call__(self, input, target):
        input = np.asarray(input)
        assert input.ndim == 5, "expected (N, D, H, W, C) probability maps"
        n_classes = input.shape[-1]
        target = np.asarray(target)
        if target.ndim == 4:
            target = np.asarray(
                expand_as_one_hot(target, n_classes, ignore_index=self.ignore_index)
            )
        assert input.shape == target.shape

        per_batch_iou = []
        for _input, _target in zip(input, target):
            binary_prediction = self._binarize_predictions(_input, n_classes)
            if self.ignore_index is not None:
                mask = _target == self.ignore_index
                binary_prediction = np.where(mask, 0, binary_prediction)
                _target = np.where(mask, 0, _target)
            binary_prediction = binary_prediction.astype(np.uint8)
            _target = _target.astype(np.uint8)

            per_channel_iou = [
                self._jaccard_index(binary_prediction[..., c], _target[..., c])
                for c in range(n_classes)
                if c not in self.skip_channels
            ]
            assert per_channel_iou, "All channels were ignored from the computation"
            per_batch_iou.append(np.mean(per_channel_iou))
        return float(np.mean(per_batch_iou))

    @staticmethod
    def _binarize_predictions(input, n_classes):
        if n_classes == 1:
            return (input > 0.5).astype(np.int64)
        max_index = np.argmax(input, axis=-1)
        return (
            np.arange(n_classes) == max_index[..., None]
        ).astype(np.uint8)

    @staticmethod
    def _jaccard_index(prediction, target):
        union = np.sum(prediction | target).astype(np.float64)
        return float(np.sum(prediction & target) / max(union, 1e-8))


@EVAL_METRICS.register("AdaptedRandError")
class AdaptedRandError:
    """SNEMI3D ARand over a batch (reference metrics.py:107-180): convert the
    network output to candidate segmentations, score each channel against the
    ground truth, keep the per-sample minimum, average over the batch."""

    def __init__(self, use_last_target: bool = False, ignore_index=None, **kwargs):
        self.use_last_target = use_last_target
        self.ignore_index = ignore_index

    def __call__(self, input, target) -> float:
        input, target = convert_to_numpy(input, target)
        # channels-last → take the requested target channel to 4D (N,D,H,W)
        if self.use_last_target:
            target = target[..., -1]
        else:
            target = target[..., 0]
        target = target.astype(np.int32)
        if self.ignore_index is not None:
            target[target == self.ignore_index] = 0

        per_batch_arand = []
        for _input, _target in zip(input, target):
            if np.all(_target == _target.flat[0]):
                logger.info(
                    "Skipping ARandError computation: only 1 label present in "
                    "the ground truth"
                )
                per_batch_arand.append(0.0)
                continue
            segm = self.input_to_segm(_input)  # (C, D, H, W)
            assert segm.ndim == 4
            per_channel_arand = [
                adapted_rand_error(_target, channel_segm)[0] for channel_segm in segm
            ]
            per_batch_arand.append(np.min(per_channel_arand))

        mean_arand = float(np.mean(per_batch_arand))
        logger.info(f"ARand: {mean_arand}")
        return mean_arand

    def input_to_segm(self, input):
        # input is (D, H, W, C) channels-last; segmentations are returned
        # channel-first (C, D, H, W) as in the reference contract
        return np.moveaxis(input, -1, 0)


@EVAL_METRICS.register("BoundaryAdaptedRandError")
class BoundaryAdaptedRandError(AdaptedRandError):
    """Threshold boundary pmaps, invert, connected components → candidate
    segmentations (reference metrics.py:183-219)."""

    def __init__(self, thresholds=None, use_last_target=True, ignore_index=None,
                 input_channel=None, invert_pmaps=True, **kwargs):
        super().__init__(use_last_target=use_last_target, ignore_index=ignore_index,
                         **kwargs)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel
        self.invert_pmaps = invert_pmaps

    def input_to_segm(self, input):
        input = np.moveaxis(input, -1, 0)  # (C, D, H, W)
        if self.input_channel is not None:
            input = np.expand_dims(input[self.input_channel], axis=0)
        segs = []
        for predictions in input:
            for th in self.thresholds:
                predictions_th = predictions > th
                if self.invert_pmaps:
                    predictions_th = np.logical_not(predictions_th)
                seg = cc_label(
                    predictions_th.astype(np.uint8), background=0, connectivity=1
                )
                segs.append(seg)
        return np.stack(segs)


@EVAL_METRICS.register("GenericAdaptedRandError")
class GenericAdaptedRandError(AdaptedRandError):
    """Selected (possibly inverted) channels → threshold → connected
    components (reference metrics.py:222-257)."""

    def __init__(self, input_channels, thresholds=None, use_last_target=True,
                 ignore_index=None, invert_channels=None, **kwargs):
        super().__init__(use_last_target=use_last_target, ignore_index=ignore_index,
                         **kwargs)
        assert isinstance(input_channels, (list, tuple))
        self.input_channels = input_channels
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.invert_channels = invert_channels or []

    def input_to_segm(self, input):
        input = np.moveaxis(input, -1, 0)
        results = []
        for i in self.input_channels:
            c = input[i]
            if i in self.invert_channels:
                c = 1 - c
            results.append(c)
        input = np.stack(results)
        segs = []
        for predictions in input:
            for th in self.thresholds:
                seg = cc_label(
                    (predictions > th).astype(np.uint8), background=0, connectivity=1
                )
                segs.append(seg)
        return np.stack(segs)


@EVAL_METRICS.register("GenericAveragePrecision")
class GenericAveragePrecision:
    """AP/accuracy of instance matches over candidate segmentations
    (reference metrics.py:260-330)."""

    def __init__(self, min_instance_size=None, use_last_target=False, metric="ap",
                 **kwargs):
        self.min_instance_size = min_instance_size
        self.use_last_target = use_last_target
        assert metric in ["ap", "acc"]
        self.metric = AveragePrecision() if metric == "ap" else Accuracy(0.5)

    def __call__(self, input, target) -> float:
        multi_head = isinstance(input, tuple)
        if multi_head:
            input1, input2 = convert_to_numpy(*input)
        else:
            (input1,) = convert_to_numpy(input)
            input2 = input1
        (target,) = convert_to_numpy(target)
        if target.ndim == 5:
            target = target[..., -1] if self.use_last_target else target[..., 0]

        batch_aps = []
        for i_batch, (inp1, inp2, tar) in enumerate(zip(input1, input2, target)):
            inp = (inp1, inp2) if multi_head else inp1
            segs = self.input_to_seg(inp, tar)
            assert segs.ndim == 4
            tar = self._filter_instances(self.target_to_seg(tar))
            segs_aps = [self.metric(self._filter_instances(seg), tar) for seg in segs]
            logger.info(
                f"Batch: {i_batch}. Max Average Precision for channel: "
                f"{np.argmax(segs_aps)}"
            )
            batch_aps.append(np.max(segs_aps))
        return float(np.mean(batch_aps))

    def _filter_instances(self, input):
        if self.min_instance_size is not None:
            # copy before zeroing: `input` may be a no-copy view of the
            # caller's array (convert_to_numpy is np.asarray, unlike the
            # reference's CUDA .cpu() which always copied) — in-place
            # filtering would corrupt the caller's labels
            input = np.array(input)
            labels, counts = np.unique(input, return_counts=True)
            for lab, count in zip(labels, counts):
                if count < self.min_instance_size:
                    input[input == lab] = 0
        return input

    def input_to_seg(self, input, target=None):
        raise NotImplementedError

    def target_to_seg(self, target):
        return target


@EVAL_METRICS.register("BlobsAveragePrecision")
class BlobsAveragePrecision(GenericAveragePrecision):
    """AP from a foreground pmap channel (reference metrics.py:333-354)."""

    def __init__(self, thresholds=None, metric="ap", min_instance_size=None,
                 input_channel=0, **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True,
                         metric=metric)
        if thresholds is None:
            thresholds = [0.4, 0.5, 0.6, 0.7, 0.8]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel

    def input_to_seg(self, input, target=None):
        input = np.moveaxis(input, -1, 0)[self.input_channel]
        segs = []
        for th in self.thresholds:
            mask = (input > th).astype(np.uint8)
            segs.append(cc_label(mask, background=0, connectivity=1))
        return np.stack(segs)


@EVAL_METRICS.register("BlobsBoundaryAveragePrecision")
class BlobsBoundaryAveragePrecision(GenericAveragePrecision):
    """AP from (P_mask − P_boundary) > th (reference metrics.py:357-378)."""

    def __init__(self, thresholds=None, metric="ap", min_instance_size=None, **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True,
                         metric=metric)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6, 0.7]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds

    def input_to_seg(self, input, target=None):
        input = np.moveaxis(input, -1, 0)
        input = input[0] - input[1]
        segs = []
        for th in self.thresholds:
            mask = (input > th).astype(np.uint8)
            segs.append(cc_label(mask, background=0, connectivity=1))
        return np.stack(segs)


@EVAL_METRICS.register("BoundaryAveragePrecision")
class BoundaryAveragePrecision(GenericAveragePrecision):
    """AP from an inverted thresholded boundary pmap (metrics.py:381-401)."""

    def __init__(self, thresholds=None, min_instance_size=None, input_channel=0,
                 **kwargs):
        super().__init__(min_instance_size=min_instance_size, use_last_target=True)
        if thresholds is None:
            thresholds = [0.3, 0.4, 0.5, 0.6]
        assert isinstance(thresholds, list)
        self.thresholds = thresholds
        self.input_channel = input_channel

    def input_to_seg(self, input, target=None):
        input = np.moveaxis(input, -1, 0)[self.input_channel]
        segs = []
        for th in self.thresholds:
            segs.append(
                cc_label(
                    np.logical_not(input > th).astype(np.uint8),
                    background=0, connectivity=1,
                )
            )
        return np.stack(segs)


@EVAL_METRICS.register("PSNR")
class PSNR:
    def __init__(self, **kwargs):
        pass

    def __call__(self, input, target):
        input, target = convert_to_numpy(input, target)
        return peak_signal_noise_ratio(target, input)


@EVAL_METRICS.register("MSE")
class MSE:
    def __init__(self, **kwargs):
        pass

    def __call__(self, input, target):
        input, target = convert_to_numpy(input, target)
        return mean_squared_error(input, target)


def get_evaluation_metric(config: Dict[str, Any]):
    """Build the eval metric from ``config['eval_metric']``
    (reference metrics.py:430-445)."""
    assert "eval_metric" in config, "Could not find evaluation metric configuration"
    metric_config = config["eval_metric"]
    metric_class = EVAL_METRICS.get(metric_config["name"])
    return metric_class(**metric_config)
