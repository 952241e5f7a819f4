"""Tracing & profiling — first-class (SURVEY.md §5.1: the reference has none).

- ``trace`` context manager wraps ``jax.profiler`` so any region can be dumped
  for TensorBoard/XProf (`xplane.pb` under log_dir);
- ``StepTimer`` records per-step wall times with warmup skipping and
  percentile summaries — the evidence path for perf claims;
- ``time_fn`` micro-benchmarks a jitted callable with proper
  block_until_ready fencing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock stats with warmup skipping."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self._times: List[float] = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs) -> Dict[str, float]:
    """Benchmark a callable returning jax arrays (blocks on the result)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "p50_s": float(np.percentile(arr, 50)),
        "min_s": float(arr.min()),
        "iters": iters,
    }
