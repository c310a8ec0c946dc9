"""Profiling and observability helpers.

The reference's tracing story is print-based wall times and CUDA peak memory
(SURVEY.md §5: train.py:38-50, eval.py:29-32). Here the comparable numbers
come from real instrumentation:

- :func:`trace` — context manager writing a jax.profiler trace viewable in
  TensorBoard / Perfetto;
- :func:`device_memory_stats` — per-device HBM usage (bytes in use / peak),
  the TPU analog of torch.cuda.max_memory_allocated;
- :class:`StepTimer` — EMA step timing with blocking semantics for honest
  device measurement.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, float]:
    """HBM stats in MB for a device (defaults to device 0). Returns empty on
    backends that do not expose memory_stats (e.g. CPU)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    scale = 1.0 / (1024 ** 2)
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if key in stats:
            out[key.replace("bytes", "mb")] = stats[key] * scale
    return out


class StepTimer:
    """Wall-clock step timer with exponential smoothing.

    Call ``tick(result)`` once per step with the step's output; it blocks on
    the result so the measurement covers device time, then returns
    (last_seconds, smoothed_seconds).
    """

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.smoothed: Optional[float] = None
        self._last_start = time.perf_counter()

    def tick(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        elapsed = now - self._last_start
        self._last_start = now
        self.smoothed = (elapsed if self.smoothed is None
                         else self.smoothing * self.smoothed
                         + (1 - self.smoothing) * elapsed)
        return elapsed, self.smoothed
