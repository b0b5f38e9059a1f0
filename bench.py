"""Headline benchmark: streamed IMU frames/sec/chip.

North-star metric (BASELINE.md): >= 10,000 streamed frames/sec/chip on TPU
v5e-1. The reference's streaming path re-runs a 45-frame window through all
four modules per frame on GPU (reference net.py:174-219); here the same
semantics run as a device-resident `lax.scan` over frames (one dispatch for
the whole run) with many independent streams batched via vmap.

Timing is transport-honest: the whole frame loop executes inside one jit
region, a single scalar is fetched at the end, and the measured transport
round trip is subtracted (see benchmarks/timing.py — on tunneled devices
`block_until_ready` alone under-reports).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 10_000.0  # north-star target, frames/sec/chip


def main():
    from benchmarks.timing import rtt_seconds, timed_fetch
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules

    n_streams = int(os.environ.get("BENCH_STREAMS", "256"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "100"))

    body = ParametricModel.from_file_or_synthetic(None)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))

    # state lives on device in steady-state serving: place it once so the
    # timed region measures compute, not a per-call host->device upload
    states = jax.tree_util.tree_map(jnp.asarray,
                                    net.init_online_state_batched(n_streams))

    # One dispatch: batch-major streams, scan over frames inside; returns a
    # scalar so the fetch is cheap but forces full execution.
    @jax.jit
    def run(params, states, frames):
        (pose, joints, root, contact), _ = net.forward_online_sequence_batched(
            params, states, frames)
        return root.sum()

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randn(n_frames, n_streams, 60).astype(np.float32) * 0.1)

    rtt = rtt_seconds()
    wall = timed_fetch(run, params, states, frames)
    fps = n_streams * n_frames / max(wall - rtt, 1e-9)

    print(json.dumps({
        "metric": "streamed_imu_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
