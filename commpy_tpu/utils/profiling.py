"""Profiling / observability helpers (absent in the reference, SURVEY §5).

* :func:`trace` — context manager around ``jax.profiler`` traces
  (view with TensorBoard / xprof);
* :class:`Throughput` — simple samples-per-second meter with
  ``block_until_ready`` semantics for honest device timing;
* :func:`benchmark` — median-of-n wall-clock of a jitted callable.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "Throughput", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Accumulating items/s meter."""

    def __init__(self):
        self.items = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_items: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.items += n_items

    @property
    def per_second(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Median wall-clock seconds per call; blocks on device results."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
