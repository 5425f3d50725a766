"""Profiling utilities: trace file emission, StepTimer math, memory summary,
and trainer profile_dir integration."""

import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from mdeical_image_segmentation_tpu.train.profiling import (
    StepTimer,
    device_memory_summary,
    trace,
)


def test_trace_writes_xplane(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        x = jnp.ones((128, 128))
        jax.block_until_ready(x @ x)
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, "no xplane trace emitted"


def test_step_timer():
    t = StepTimer()
    x = jnp.ones((8,))
    for _ in range(5):
        t.tick()
    ms = t.synced_lap(x)
    assert ms is not None and ms >= 0
    for _ in range(3):
        t.tick()
    t.synced_lap(x)
    s = t.summary()
    assert "ms_per_step_mean" in s and s["ms_per_step_p50"] >= 0


def test_memory_summary():
    out = device_memory_summary()
    assert len(out) == len(jax.devices())
    assert all("device" in d for d in out)


def test_trainer_profile_dir(tmp_path):
    from mdeical_image_segmentation_tpu.data import SyntheticSliceDataset
    from mdeical_image_segmentation_tpu.models import UNetConfig, UNetModel
    from mdeical_image_segmentation_tpu.train import Trainer, TrainingArguments

    ds = SyntheticSliceDataset(n_samples=16, resolution=16)
    model = UNetModel(
        UNetConfig(in_channels=1, out_channels=1, unet_type="UNet", base_features=2)
    )
    args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        max_steps=5,
        per_device_train_batch_size=1,
        eval_strategy="no",
        logging_steps=0,
        save_steps=0,
        profile_dir=str(tmp_path / "prof"),
        profile_start_step=2,
        profile_num_steps=2,
    )
    Trainer(model, args, ds).train()
    files = glob.glob(str(tmp_path / "prof" / "**" / "*.xplane.pb"), recursive=True)
    assert files, "trainer did not emit a profiler trace"
