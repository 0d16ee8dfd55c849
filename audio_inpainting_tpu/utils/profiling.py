"""Tracing/profiling utilities.

The reference's only observability is emoji prints (SURVEY.md §5). Here:
- ``device_trace``: context manager around jax.profiler.trace producing a
  TensorBoard/Perfetto trace of device execution.
- ``Timer``: lightweight wall-clock section timer that blocks on device
  results, used by the pipelines' per-method metrics.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock section timer; call .lap('name') after blocking work."""

    def __init__(self):
        self.t0 = time.time()
        self.laps: dict[str, float] = {}

    def lap(self, name: str, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.time()
        self.laps[name] = now - self.t0
        self.t0 = now
        return self.laps[name]
