"""Headline benchmark: streamed IMU frames/sec/chip.

North-star metric (BASELINE.md): >= 10,000 streamed frames/sec/chip on TPU
v5e-1. The reference's streaming path re-runs a 45-frame window through all
four modules per frame on GPU (reference net.py:174-219); here the same
semantics run as one jitted step, and many independent streams batch via
vmap so the chip's MXU stays busy.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 10_000.0  # north-star target, frames/sec/chip


def main():
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules

    n_streams = int(os.environ.get("BENCH_STREAMS", "256"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "50"))

    body = ParametricModel.from_file_or_synthetic(None)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))

    # Batch n_streams independent streaming states via vmap.
    state0 = net.init_online_state()
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_streams,) + jnp.shape(x)), state0)
    step = jax.jit(jax.vmap(net.forward_online, in_axes=(None, 0, 0)))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(n_frames, n_streams, 60).astype(np.float32) * 0.1)

    # Warmup / compile.
    (_, _, root, _), states = step(params, states, frames[0])
    jax.block_until_ready(root)

    t0 = time.perf_counter()
    for i in range(1, n_frames):
        (_, _, root, _), states = step(params, states, frames[i])
    jax.block_until_ready(root)
    dt = time.perf_counter() - t0

    fps = n_streams * (n_frames - 1) / dt
    print(json.dumps({
        "metric": "streamed_imu_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
