"""Tracing / observability (SURVEY §5.1, §5.5).

The reference's only instrumentation is tqdm progress bars and verbose rule
dumps. Here:

- :class:`StepTimer` — a sampler ``callback`` that records per-step wall
  times (device-synced) and reports p50/p90/mean; works with the samplers'
  ``method="python"`` eager loop.
- :func:`trace` — context manager around ``jax.profiler`` for TPU traces.
- :func:`verbose_writer` — the WCFG-style rule-dump channel (plain print;
  pluggable sink).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class StepTimer:
    """Collects per-step latencies from a sampler callback."""

    def __init__(self, *, sync: bool = True):
        self.sync = sync
        self.times: list[float] = []
        self._last = None

    def __call__(self, info: dict) -> None:
        if self.sync and "x" in info:
            # NOTE: through remote-execution transports block_until_ready
            # may resolve before execution completes (see bench._force);
            # per-step wall times are lower bounds there. On directly
            # attached devices this is exact.
            jax.block_until_ready(info["x"])
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def start(self) -> None:
        self._last = time.perf_counter()

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),  # timed intervals (call start() for all steps)
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "mean_ms": float(arr.mean() * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sonar_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


_VERBOSE_SINK: Callable[[str], None] = print


def set_verbose_sink(fn: Callable[[str], None]) -> None:
    global _VERBOSE_SINK
    _VERBOSE_SINK = fn


def verbose_writer(msg: str) -> None:
    _VERBOSE_SINK(msg)
