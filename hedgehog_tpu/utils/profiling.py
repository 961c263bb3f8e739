"""Profiling helpers (SURVEY §5 tracing/observability).

The reference ships BenchmarkTools harnesses in examples/ only; here the
equivalents are jax.profiler traces plus timing helpers used by bench.py and
examples/model_comparison.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "time_fn"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/hedgehog_trace") -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, reps: int = 10, warmup: int = 2):
    """Median wall time (seconds) of ``fn(*args)`` with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
