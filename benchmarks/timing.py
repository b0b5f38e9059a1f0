"""Honest device timing over high-latency transports.

On a tunneled TPU, `block_until_ready` can return before remote execution
completes and a single device->host fetch carries a ~30 ms round trip, so
naive per-call timing measures the transport, not the chip. The harness
here:

  * `rtt_seconds()` — measures the fetch round trip with a trivial program;
  * `timed_fetch(fn, *args)` — wall time of one call *including* a forced
    scalar fetch (ground truth, transport included);
  * device-resident repetition — benchmarks chain R iterations *inside* one
    jit region (lax.fori_loop / lax.scan with a data dependency between
    iterations so nothing is elided), fetch once, and report
    (wall - rtt) / R.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def timed_fetch(fn: Callable, *args, reps: int = 5) -> float:
    """Median wall seconds of fn(*args) + fetch of its scalar result."""
    out = np.asarray(fn(*args))
    assert np.ndim(out) == 0, "timed_fetch expects a scalar-returning fn"
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def rtt_seconds() -> float:
    """Transport round trip: trivial jit + scalar fetch."""
    f = jax.jit(lambda x: x + 1.0)
    return timed_fetch(f, jnp.float32(0.0), reps=7)


def device_seconds_per_iter(scalar_fn: Callable, *args, iters: int,
                            rtt: float | None = None) -> float:
    """Per-iteration device seconds for a scalar_fn that internally runs
    `iters` chained iterations on device."""
    if rtt is None:
        rtt = rtt_seconds()
    wall = timed_fetch(scalar_fn, *args)
    return max(wall - rtt, 1e-9) / iters
