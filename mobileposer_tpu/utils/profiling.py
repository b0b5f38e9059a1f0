"""Profiling / observability helpers.

The reference has no profiler integration (SURVEY §5: only a sensor-path
Hz logger). Here: a context manager around jax.profiler traces (viewable
in TensorBoard/Perfetto), device memory stats, and a tiny step timer that
is honest over high-latency transports (delegates to benchmarks/timing
semantics: forces a scalar fetch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device trace: `with trace("/tmp/t"): run_step()`; open the
    directory with TensorBoard or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Per-device allocator stats (bytes) when the backend exposes them."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", None)
    if stats is None:
        return None
    try:
        return dict(stats() or {})
    except Exception:
        return None


class StepTimer:
    """Rolling per-step wall time with forced completion.

    `timer.measure(fn, *args)` fetches a scalar from fn's output so the
    measurement includes device execution (block_until_ready alone can
    under-report on tunneled devices — see benchmarks/timing.py).
    """

    def __init__(self, window: int = 50):
        self.window = window
        self.samples: list = []

    def measure(self, fn, *args) -> float:
        t0 = time.perf_counter()
        out = fn(*args)
        # force EVERY leaf: outputs from separate dispatches would
        # otherwise still be in flight when the clock is read
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(jax.numpy.ravel(leaf)[0])
        dt = time.perf_counter() - t0
        self.samples.append(dt)
        self.samples = self.samples[-self.window:]
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.samples)) if self.samples else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self.samples)) if self.samples else 0.0
