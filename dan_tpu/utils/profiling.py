"""Profiling / tracing hooks (SURVEY.md §5 'Tracing / profiling'):
jax.profiler trace flag + block_until_ready-bracketed throughput counters —
the north-star images/sec/chip metric."""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Wrap a region in a jax profiler trace when trace_dir is given."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield


class ThroughputMeter:
    """images/sec(/chip) over a sliding window of steps."""

    def __init__(self, per_step_images: int, n_chips: int = 1):
        self.per_step_images = per_step_images
        self.n_chips = n_chips
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    @property
    def images_per_sec(self) -> float:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps * self.per_step_images / dt

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / self.n_chips
