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


def device_barrier(out) -> None:
    """True completion barrier: host-fetch one scalar derived from ``out``.

    ``jax.block_until_ready`` returns after DISPATCH (not completion) on
    relay-attached backends (axon) — it reported physically impossible
    throughput (898% MFU) in round-2 measurements.  The device executes
    in order, so fetching a scalar that depends on ``out`` waits for
    everything enqueued before it.
    """
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def time_fn(fn: Callable, *args, iters: int = 10, reps: int = 3, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Benchmark a callable returning jax arrays.

    Times ``reps`` bursts of ``iters`` calls, each burst closed by a single
    ``device_barrier`` host fetch — one relay round-trip amortized over the
    burst instead of added to every call.  Returns per-call seconds.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    device_barrier(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args, **kwargs)
        device_barrier(out)
        times.append((time.perf_counter() - t0) / iters)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "p50_s": float(np.percentile(arr, 50)),
        "min_s": float(arr.min()),
        "iters": iters,
        "reps": reps,
    }
