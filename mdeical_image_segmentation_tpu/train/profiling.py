"""Profiling / tracing — first-class observability (SURVEY.md §5).

The reference has no profiling beyond a single wall-clock inference timer
(predictor.py:88,151).  Here:

- ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable XPlane trace (op-level timeline incl. HBM transfers);
- ``StepTimer`` — streaming per-step wall timing with percentile summaries,
  designed for async dispatch: ``tick()`` marks step submission and the
  timer blocks on a supplied array only at report time (so timing doesn't
  serialize the device pipeline);
- ``device_memory_summary()`` — per-device live-buffer accounting;
- ``ProfiledSection`` — named ``jax.profiler.TraceAnnotation`` wrapper so
  trainer phases (augment/forward/backward/eval) are labeled in traces.

Both trainers accept ``profile_dir``/step-timer integration through these
utilities without importing TensorFlow.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class ProfiledSection:
    """Named trace annotation: ``with ProfiledSection("forward"): ...``"""

    def __init__(self, name: str):
        self._ann = jax.profiler.TraceAnnotation(name)

    def __enter__(self):
        self._ann.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ann.__exit__(*exc)


class StepTimer:
    """Async-safe step timing.

    Usage per step::

        timer.tick()                # right after dispatching the step
        ...
        timer.synced_lap(loss)      # occasionally: blocks on `loss`, records

    ``tick`` alone records dispatch-to-dispatch intervals (cheap, keeps the
    pipeline full); ``synced_lap`` forces completion of the dependency chain
    and gives the true per-step time over the window since the last sync.
    """

    def __init__(self, window: int = 1000):
        self.window = window
        self._ticks: List[float] = []
        self._last_sync: Optional[float] = None
        self._synced_steps = 0
        self.synced_ms: List[float] = []

    def tick(self):
        now = time.perf_counter()
        self._ticks.append(now)
        if len(self._ticks) > self.window:
            self._ticks = self._ticks[-self.window :]
        if self._last_sync is None:
            self._last_sync = now
            self._synced_steps = 0
        self._synced_steps += 1

    def synced_lap(self, value) -> Optional[float]:
        """Block on `value`, return mean ms/step since the last sync."""
        jax.block_until_ready(value)
        now = time.perf_counter()
        if self._last_sync is None or self._synced_steps == 0:
            self._last_sync = now
            return None
        ms = (now - self._last_sync) / self._synced_steps * 1e3
        self.synced_ms.append(ms)
        if len(self.synced_ms) > self.window:
            self.synced_ms = self.synced_ms[-self.window :]
        self._last_sync = now
        self._synced_steps = 0
        return ms

    def summary(self) -> Dict[str, float]:
        if not self.synced_ms:
            return {}
        arr = np.asarray(self.synced_ms)
        return {
            "ms_per_step_mean": float(arr.mean()),
            "ms_per_step_p50": float(np.percentile(arr, 50)),
            "ms_per_step_p90": float(np.percentile(arr, 90)),
        }


def device_memory_summary() -> List[Dict[str, Any]]:
    """Per-device live-buffer byte accounting."""
    out = []
    for d in jax.devices():
        stats: Dict[str, Any] = {"device": str(d)}
        try:
            ms = d.memory_stats()
            if ms:
                stats.update(
                    bytes_in_use=ms.get("bytes_in_use"),
                    peak_bytes_in_use=ms.get("peak_bytes_in_use"),
                    bytes_limit=ms.get("bytes_limit"),
                )
        except Exception:
            pass
        out.append(stats)
    return out
