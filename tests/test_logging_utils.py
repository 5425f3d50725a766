"""MetricWriter: JSONL always, TensorBoard events (incl. real image panels)
when tensorboard is available — the DefaultTensorboardFormatter parity path
(reference utils.py:148-219)."""

import json
import os

import numpy as np
import pytest

from mdeical_image_segmentation_tpu.logging_utils import (
    MetricWriter,
    TensorboardFormatter,
)


def _read_events(log_dir):
    tb = pytest.importorskip("tensorboard")
    del tb
    from tensorboard.compat.proto.event_pb2 import Event

    events = []
    for f in sorted(os.listdir(log_dir)):
        if "tfevents" not in f:
            continue
        with open(os.path.join(log_dir, f), "rb") as fh:
            data = fh.read()
        # TFRecord framing: u64 length, u32 len-crc, payload, u32 data-crc
        off = 0
        while off + 12 <= len(data):
            n = int.from_bytes(data[off:off + 8], "little")
            payload = data[off + 12:off + 12 + n]
            events.append(Event.FromString(payload))
            off += 12 + n + 4
    return events


def test_scalar_jsonl_and_tb(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.scalar("train_loss", 0.5, 3)
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0] == pytest.approx(
        {"tag": "train_loss", "value": 0.5, "step": 3,
         "time": rows[0]["time"]}
    )
    events = _read_events(str(tmp_path))
    scalars = [
        v for e in events for v in e.summary.value if v.tag == "train_loss"
    ]
    assert scalars and scalars[0].simple_value == pytest.approx(0.5)


def test_image_writes_real_tb_image_summary(tmp_path):
    """writer.image must emit an actual TB image panel — pre-fix it logged
    only a (meaningless) '/mean' scalar of the normalized slice and the
    3D trainer's train_/val_ panels were silently discarded (round-3
    review finding)."""
    w = MetricWriter(str(tmp_path))
    img = np.linspace(0, 1, 64 * 48, dtype=np.float32).reshape(64, 48)
    w.image("val_prediction/batch_0/channel_0", img, 7)
    w.close()
    events = _read_events(str(tmp_path))
    imgs = [
        v
        for e in events
        for v in e.summary.value
        if v.tag == "val_prediction/batch_0/channel_0"
        and v.HasField("image")
    ]
    assert imgs, "no TB image summary written"
    assert imgs[0].image.height == 64 and imgs[0].image.width == 48
    assert imgs[0].image.encoded_image_string[:8] == b"\x89PNG\r\n\x1a\n"


def test_formatter_then_image_roundtrip(tmp_path):
    """The trainer3d path: formatter tags/normalizes a (N, H, W, C) batch,
    every panel lands in TB."""
    w = MetricWriter(str(tmp_path))
    batch = np.random.RandomState(0).rand(2, 8, 8, 1).astype(np.float32)
    for tag, img in TensorboardFormatter()("train_inputs", batch):
        w.image(tag, img, 1)
    w.close()
    events = _read_events(str(tmp_path))
    tags = {
        v.tag for e in events for v in e.summary.value if v.HasField("image")
    }
    assert tags == {
        "train_inputs/batch_0/channel_0",
        "train_inputs/batch_1/channel_0",
    }


def test_eval_strategy_typo_rejected():
    from mdeical_image_segmentation_tpu.train.trainer2d import (
        TrainingArguments,
    )

    with pytest.raises(ValueError, match="eval_strategy"):
        TrainingArguments(output_dir="/tmp/x", eval_strategy="step")
