"""Tracing/profiling — a subsystem the reference lacks entirely
(SURVEY.md §5.1: only a running-loss print every 200 steps).

Provides:
* ``trace(logdir)`` — context manager around ``jax.profiler`` trace capture
  (open the result in XProf/TensorBoard).
* ``StepTimer`` — lightweight wall-clock step timing with percentile summary,
  used by the Trainer for pairs/sec reporting.
* ``annotate`` — named trace region (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self._durations: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._durations.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self, skip_first: int = 1) -> dict:
        d = np.asarray(self._durations[skip_first:] or self._durations)
        if not len(d):
            return {}
        return {
            "steps": len(d),
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p95_ms": float(np.percentile(d, 95) * 1e3),
        }
