"""Tracing / profiling helpers.

The reference has no profiling beyond tqdm (SURVEY.md §5.1).  Here:
``trace`` context wraps jax.profiler traces around hot regions (denoise
loop, data stage), ``annotate`` adds named spans visible in the TPU
trace viewer, and ``Throughput`` computes the images/sec metric with
proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Synchronized images/sec measurement."""

    def __init__(self):
        self.images = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        self.images = 0

    def add(self, result, n_images: int):
        jax.block_until_ready(result)
        self.images += n_images

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.images / dt if dt > 0 else 0.0
