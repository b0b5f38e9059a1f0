"""Measure uni full-length LSTM routing for int8 params (real chip).

Under backend='auto', full-length UNIdirectional layers stay on the XLA
scan — the one case XLA beat the Pallas kernels in float (CLAUDE.md perf
rules). With int8 params the tradeoff may flip: the XLA scan pays a
per-step dynamic-quantize + int8 dot that XLA may not schedule as well
as Mosaic does. This probe times the four variants on velocity-shaped
exact-window work (T=45, B=256, H=256 — one per-frame scan step of the
streaming headline) and prints a routing recommendation. Evidence for
flipping `_use_pallas` for quantized uni layers; until it wins, 'auto'
keeps uni-int8 on XLA.

    python scripts/int8_uni_probe.py [--T 45] [--B 256] [--H 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--T", type=int, default=45)
    parser.add_argument("--B", type=int, default=256)
    parser.add_argument("--H", type=int, default=256)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import rtt_seconds, timed_fetch
    from mobileposer_tpu.nn.lstm import _lstm_scan, init_lstm_layer
    from mobileposer_tpu.ops.lstm_pallas import (lstm_layer_pallas,
                                                 lstm_layer_pallas_int8)
    from mobileposer_tpu.ops.quant import quantize_lstm_direction

    T, B, H = args.T, args.B, args.H
    p = jax.device_get(init_lstm_layer(jax.random.PRNGKey(0), H, H))
    pq = quantize_lstm_direction(p)
    rng = np.random.RandomState(1)
    x_proj = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.2)
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    rtt = rtt_seconds()

    variants = {
        "float_xla_scan": jax.jit(lambda xp: _lstm_scan(
            xp, jnp.asarray(p["w_hh"]), h0, c0, None)[0].sum()),
        "float_uni_kernel": jax.jit(lambda xp: lstm_layer_pallas(
            xp, jnp.asarray(p["w_hh"]), h0, c0)[0].sum()),
        "int8_xla_scan": jax.jit(lambda xp: _lstm_scan(
            xp, jnp.asarray(pq["w_hh"]), h0, c0, None,
            jnp.asarray(pq["w_hh_scale"]))[0].sum()),
        "int8_uni_kernel": jax.jit(lambda xp: lstm_layer_pallas_int8(
            xp, jnp.asarray(pq["w_hh"]), jnp.asarray(pq["w_hh_scale"]),
            h0, c0)[0].sum()),
    }
    times = {}
    for name, fn in variants.items():
        dev = max(timed_fetch(fn, x_proj, reps=args.reps) - rtt, 1e-9)
        times[name] = dev
        print(f"{name}: {dev * 1e3:.3f} ms  "
              f"({T * B * H * 4 * H * 2 / dev / 1e12:.2f} TFLOP/s)",
              flush=True)

    best_int8 = min(("int8_xla_scan", "int8_uni_kernel"), key=times.get)
    ratio = times["int8_xla_scan"] / times["int8_uni_kernel"]
    print(f"\nint8 uni routing: {best_int8} wins "
          f"(xla/kernel = {ratio:.2f}x)", flush=True)
    if best_int8 == "int8_uni_kernel" and ratio > 1.15:
        print("RECOMMEND: route quantized uni full-length layers through "
              "lstm_layer_pallas_int8 under 'auto' (_use_pallas)", flush=True)
    else:
        print("KEEP: 'auto' stays on the XLA int8 scan for uni full-length",
              flush=True)


if __name__ == "__main__":
    main()
