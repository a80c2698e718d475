"""Profiling / tracing hooks.

The reference has no tracing beyond wall-clock meters (SURVEY.md §5); here we
expose the TPU-native tools: jax.profiler traces viewable in TensorBoard /
Perfetto, plus a block_until_ready-bracketed step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a code region.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with device synchronization.

    Usage:
        timer = StepTimer()
        dt = timer.time_fn(lambda: step(...))  # blocks on the output
    """

    def __init__(self):
        self.history = []

    def time_fn(self, fn, iters: int = 1) -> float:
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        self.history.append(dt)
        return dt


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
