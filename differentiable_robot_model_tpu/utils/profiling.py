"""Profiling, benchmarking, and numerical-debug utilities.

The reference has no tracing/profiling at all (SURVEY.md §5: utils.py:12
imports timeit but never uses it). This module provides the TPU-native
equivalents: device-accurate timing (block_until_ready), jax.profiler trace
capture for xprof/tensorboard, annotated solver phases, and NaN-debug
toggles.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax


@dataclass
class BenchResult:
    mean_s: float
    best_s: float
    iters: int

    @property
    def mean_ms(self) -> float:
        return self.mean_s * 1e3

    def throughput(self, items: int) -> float:
        return items / self.mean_s


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    pipelined: bool = True,
    windows: int = 1,
    **kwargs,
) -> BenchResult:
    """Device-accurate wall timing of a jitted callable.

    pipelined=True (default) dispatches all iterations asynchronously and
    blocks once — measuring device throughput. When the device is remote
    (e.g. a tunneled TPU), per-call blocking adds tens of ms of round-trip
    latency that is NOT device time; pipelined=False measures that
    end-to-end latency instead.

    `windows` repeats the pipelined measurement and reports best-of-windows
    in `.best` (tunnel jitter is ~2x run-to-run; best-of-3 is this repo's
    recorded-number methodology — bench.py, benchmarks/). `.mean` stays the
    mean over all windows.
    """
    if iters < 1:
        raise ValueError(f"benchmark() requires iters >= 1, got {iters}")
    if warmup:
        for _ in range(warmup):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    if pipelined:
        per_window = []
        for _ in range(max(1, windows)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            per_window.append((time.perf_counter() - t0) / iters)
        return BenchResult(
            sum(per_window) / len(per_window), min(per_window), iters
        )
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return BenchResult(sum(times) / len(times), min(times), iters)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for solver phases (shows up in the profiler)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans toggle (SURVEY.md §5 numerical-guard story)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
