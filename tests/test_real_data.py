"""Real-dataset validation hooks (round-4 verdict item 10).

These tests SKIP unless the real datasets are mounted and pointed at via:

    TPUSEG_DRIVE_DIR=/path/to/DRIVE  (images/ + labels/, 20 PNG pairs)
    TPUSEG_BUSI_DIR=/path/to/BUSI    (images/ + mask/0/)

When present they assert the reference's seed-42 split quirk on real counts
(DRIVE's 20 training images → 13/4/3 — /root/reference/dataset/
unet2d_dataset/MYDataset.py:85-94 with the float 70/20/10 ratios), the
loader shape contract, and one real train+eval step — the same pattern as
the torch pixel-parity tests (skip when the oracle is absent)."""

import math
import os

import numpy as np
import pytest

DRIVE_DIR = os.environ.get("TPUSEG_DRIVE_DIR")
BUSI_DIR = os.environ.get("TPUSEG_BUSI_DIR")

needs_drive = pytest.mark.skipif(
    not (DRIVE_DIR and os.path.isdir(DRIVE_DIR)),
    reason="set TPUSEG_DRIVE_DIR to the real DRIVE dataset to run",
)
needs_busi = pytest.mark.skipif(
    not (BUSI_DIR and os.path.isdir(BUSI_DIR)),
    reason="set TPUSEG_BUSI_DIR to the real BUSI dataset to run",
)


def _expected_split(n, train_ratio=0.7, eval_ratio=0.2):
    """sklearn train_test_split sizing: ceil for the test_size side.

    For DRIVE's n=20 this yields 13/4/3 — the reference's seed-42 float
    quirk (0.3*20 = 6.0 but ceil(6.000000000000001) = 7 temp → 13 train)."""
    n_temp = math.ceil(n * (1 - train_ratio))
    n_train = n - n_temp
    eval_size = eval_ratio / (1 - train_ratio)
    n_test = math.ceil(n_temp * (1 - eval_size))
    n_eval = n_temp - n_test
    return n_train, n_eval, n_test


@needs_drive
def test_drive_seed42_split_counts():
    from mdeical_image_segmentation_tpu.data import DRIVEDataset

    splits = {
        mode: DRIVEDataset(DRIVE_DIR, mode=mode, resolution=64)
        for mode in ("train", "eval", "test")
    }
    n = sum(len(d) for d in splits.values())
    exp = _expected_split(n)
    assert (len(splits["train"]), len(splits["eval"]), len(splits["test"])) == exp
    if n == 20:  # the standard DRIVE training set
        assert exp == (13, 4, 3)
    # split is a partition: no image appears in two modes
    all_paths = [p for d in splits.values() for p in d.images_path]
    assert len(set(all_paths)) == len(all_paths) == n


@needs_drive
def test_drive_loader_shapes_and_ranges():
    from mdeical_image_segmentation_tpu.data import DRIVEDataset
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    ds = DRIVEDataset(DRIVE_DIR, mode="train", resolution=128)
    assert ds.num_channels == 3  # DRIVE is RGB
    batch = next(iter(BatchLoader(ds, 2, shuffle=False)))
    assert batch["images"].shape == (2, 128, 128, 3)
    assert batch["labels"].shape == (2, 128, 128, 1)
    assert 0.0 <= batch["images"].min() and batch["images"].max() <= 1.0
    assert set(np.unique(batch["labels"])) <= {0.0, 1.0} or (
        0.0 <= batch["labels"].min() and batch["labels"].max() <= 1.0
    )


@needs_drive
def test_drive_train_and_eval_step():
    """One real train+eval cycle on DRIVE through the full Trainer."""
    from mdeical_image_segmentation_tpu.data import DRIVEDataset
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments

    train_ds = DRIVEDataset(DRIVE_DIR, mode="train", resolution=128)
    eval_ds = DRIVEDataset(DRIVE_DIR, mode="eval", resolution=128)
    model = UNetModel(UNetConfig(in_channels=3, out_channels=1,
                                 unet_type="UNet", base_features=4))
    args = TrainingArguments(
        output_dir="/tmp/tpuseg_drive_hook", max_steps=2,
        per_device_train_batch_size=1, per_device_eval_batch_size=1,
        eval_strategy="no", logging_steps=0, save_steps=0,
    )
    trainer = Trainer(model, args, train_ds, eval_ds)
    result = trainer.train()
    assert np.isfinite(result.training_loss)
    metrics = trainer.evaluate()
    assert {"eval_iou", "eval_dice", "eval_loss"} <= set(metrics)
    assert np.isfinite(metrics["eval_loss"])


@needs_busi
def test_busi_grayscale_and_step():
    from mdeical_image_segmentation_tpu.data import BUSIDataset
    from mdeical_image_segmentation_tpu.data.collate import BatchLoader

    ds = BUSIDataset(BUSI_DIR, mode="train", resolution=128)
    assert ds.num_channels == 1  # BUSI decodes grayscale
    batch = next(iter(BatchLoader(ds, 2, shuffle=False)))
    assert batch["images"].shape == (2, 128, 128, 1)
    assert batch["labels"].shape == (2, 128, 128, 1)
