"""Logging / observability utilities.

Reference parity (/root/reference/model/unet3d/utils.py:68-272):
- ``get_logger``: memoized stdout loggers with the thread-name format;
- ``RunningAverage``: streaming mean for loss/score logging;
- ``DefaultTensorboardFormatter``: middle-z-slice image panels, min-max
  normalized, one per (batch, channel);
- a tiny ``MetricWriter`` that appends scalars to a JSONL file and, when
  tensorboard is importable, mirrors them to TB summaries — the rebuild's
  observability backbone (works headless, greppable, no TF dependency
  required).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

_loggers: Dict[str, logging.Logger] = {}


def get_logger(name: str, level=logging.INFO) -> logging.Logger:
    """Memoized stdout logger (reference utils.py:71-87)."""
    if name not in _loggers:
        logger = logging.getLogger(name)
        logger.setLevel(level)
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s [%(threadName)s] %(levelname)s %(name)s - %(message)s"
            )
        )
        logger.addHandler(handler)
        logger.propagate = False
        _loggers[name] = logger
    return _loggers[name]


class RunningAverage:
    """Streaming average (reference utils.py:94-106)."""

    def __init__(self):
        self.count = 0
        self.sum = 0.0
        self.avg = 0.0

    def update(self, value: float, n: int = 1):
        self.count += n
        self.sum += float(value) * n
        self.avg = self.sum / self.count


class TensorboardFormatter:
    """Middle-slice image panels (reference DefaultTensorboardFormatter,
    utils.py:154-187).  Input batches are channels-last (N, [D,] H, W, C);
    returns a list of (tag, HxW image) pairs, min-max normalized."""

    def __init__(self, skip_last_target: bool = False):
        self.skip_last_target = skip_last_target

    @staticmethod
    def _normalize(img: np.ndarray) -> np.ndarray:
        value_range = img.max() - img.min()
        return (img - img.min()) / (value_range + 1e-10)

    def __call__(self, name: str, batch: np.ndarray) -> List[Tuple[str, np.ndarray]]:
        batch = np.asarray(batch)
        if self.skip_last_target and name == "targets":
            batch = batch[..., :-1]
        tagged = []
        if batch.ndim == 5:  # (N, D, H, W, C) → middle z slice
            mid = batch.shape[1] // 2
            batch = batch[:, mid]
        assert batch.ndim == 4, f"expected (N, H, W, C), got {batch.shape}"
        for b in range(batch.shape[0]):
            for c in range(batch.shape[-1]):
                tag = f"{name}/batch_{b}/channel_{c}"
                tagged.append((tag, self._normalize(batch[b, ..., c])))
        return tagged


def get_tensorboard_formatter(formatter_config: Optional[dict]) -> TensorboardFormatter:
    """Reference get_tensorboard_formatter parity (utils.py:212-219)."""
    if formatter_config is None:
        return TensorboardFormatter()
    cfg = dict(formatter_config)
    cfg.pop("name", None)
    return TensorboardFormatter(**cfg)


class MetricWriter:
    """Scalars → JSONL (always) + TensorBoard events (if available)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboard.summary.writer.event_file_writer import (  # noqa
                EventFileWriter,
            )
            from tensorboard.compat.proto.summary_pb2 import Summary
            from tensorboard.compat.proto.event_pb2 import Event

            self._tb = EventFileWriter(log_dir)
            self._Summary = Summary
            self._Event = Event
        except Exception:
            self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "time": time.time()})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            summary = self._Summary(
                value=[self._Summary.Value(tag=tag, simple_value=float(value))]
            )
            event = self._Event(summary=summary, step=int(step), wall_time=time.time())
            self._tb.add_event(event)

    def scalars(self, logs: Dict[str, float], step: int):
        for k, v in logs.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                self.scalar(k, float(v), step)

    def image(self, tag: str, img: np.ndarray, step: int):
        """Write an image summary: JSONL records a stats line (it cannot
        hold pixels), TB gets the actual PNG-encoded image panel — the
        DefaultTensorboardFormatter behavior being reproduced
        (reference utils.py:148-209 via SummaryWriter.add_image)."""
        self.scalar(f"{tag}/mean", float(np.mean(img)), step)
        if self._tb is None:
            return
        import io

        from PIL import Image as PILImage

        arr = np.asarray(img)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        if arr.dtype != np.uint8:
            # formatter output is min-max normalized to [0, 1]
            arr = (np.clip(arr.astype(np.float64), 0.0, 1.0) * 255).astype(
                np.uint8
            )
        buf = io.BytesIO()
        PILImage.fromarray(arr).save(buf, format="PNG")
        colorspace = 3 if arr.ndim == 3 else 1  # RGB vs grayscale
        image_pb = self._Summary.Image(
            height=int(arr.shape[0]),
            width=int(arr.shape[1]),
            colorspace=colorspace,
            encoded_image_string=buf.getvalue(),
        )
        summary = self._Summary(
            value=[self._Summary.Value(tag=tag, image=image_pb)]
        )
        self._tb.add_event(
            self._Event(summary=summary, step=int(step), wall_time=time.time())
        )

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullMetricWriter:
    """No-op writer for non-primary processes (multi-host: only process 0
    writes logs/events; every host would otherwise race on the same files)."""

    log_dir = None

    def scalar(self, tag, value, step):
        pass

    def scalars(self, logs, step):
        pass

    def image(self, tag, img, step):
        pass

    def close(self):
        pass
