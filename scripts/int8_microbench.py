"""Dissect W8A8 int8 serving performance on the real chip.

The first r5 serving-SLO runs measured int8 serving ~10-20x SLOWER than
float at 256 streams (carry fetch p50 785 ms vs 33 ms float). This script
was written to dissect that — and found the cause in the harness, not the
chip: quantize_params_int8 returned a host-numpy tree, so every jitted
call re-uploaded all weights over the ~30 ms-RTT tunnel (now fixed: the
tree is device-resident). With that fixed, the measured story is
throughput parity (carry 1.02x float, exact 0.96x — 'int8_microbench' in
the report): dynamic quantize/dequant overhead cancels the 2x MXU rate at
hidden-256 shapes. The layer-by-layer dissection stays useful:

  1. raw matmul: `int8_matmul` vs f32/bf16 `x @ w` at the serving shapes
     (input projection [S,132]@[132,1024], recurrence [S,256]@[256,1024]);
  2. `dynamic_quantize` alone (the per-step activation quantization);
  3. one full carry step chain: `forward_carry_sequence_batched` over N
     frames at S streams, int8-quantized vs float params;
  4. the exact windowed scan the same way.

Every timed program folds ALL outputs into the fetched scalar (XLA DCE
honesty — design.md §6) and is timed with the device-resident-chain
harness (benchmarks/timing.py: tunnel RTT subtracted).

Usage:
    python scripts/int8_microbench.py [--streams 256] [--frames 64]
        [--out benchmarks/report_v5e1.json]    # merges under "int8_microbench"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=256)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    from benchmarks.timing import rtt_seconds, timed_fetch
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.ops.quant import (dynamic_quantize, int8_matmul,
                                           quantize_params_int8,
                                           quantize_weight_int8)

    S, N = args.streams, args.frames
    rtt = rtt_seconds()
    result = {"streams": S, "frames": N, "rtt_ms": round(rtt * 1e3, 1)}
    rng = np.random.RandomState(0)

    # -- 1. raw matmuls (pilot-scaled chains: these ops are sub-µs, so the
    # iteration count must be calibrated until the timed region dwarfs the
    # transport RTT — a fixed R=512 measured 0.0 µs on the first attempt) -
    def per_iter_us(step, x, K, target=0.25):
        def make(R):
            @jax.jit
            def run(x0):
                def body(_, x):
                    y = step(x)
                    # fold the wide output back to the input shape with a
                    # data dependency so no iteration can be elided
                    return x0 + y[:, :K].astype(jnp.float32) * 1e-6
                return jax.lax.fori_loop(0, R, body, x0).sum()
            return run
        R = 4096
        w = timed_fetch(make(R), x, reps=3)
        per = max(w - rtt, 1e-9) / R
        if per * R < target:
            R = 1 << int(np.ceil(np.log2(min(max(target / per, R), 2**22))))
            w = timed_fetch(make(R), x, reps=3)
            per = max(w - rtt, 1e-9) / R
        return round(per * 1e6, 3)

    for name, (M, K, Nw) in [("proj_132_1024", (S, 132, 1024)),
                             ("rec_256_1024", (S, 256, 1024))]:
        x = jnp.asarray(rng.randn(M, K).astype(np.float32))
        w = rng.randn(K, Nw).astype(np.float32)
        w_q, w_s = quantize_weight_int8(w)
        w_qd, w_sd, wd = (jax.device_put(jnp.asarray(a))
                          for a in (w_q, w_s, w))
        w_bf = wd.astype(jnp.bfloat16)
        result[name] = {
            "f32_us": per_iter_us(lambda x: x @ wd, x, K),
            "bf16_us": per_iter_us(
                lambda x: x.astype(jnp.bfloat16) @ w_bf, x, K),
            "int8_us": per_iter_us(
                lambda x: int8_matmul(x, w_qd, w_sd), x, K),
            "int8_nodq_scale_us": per_iter_us(
                lambda x: jax.lax.dot_general(
                    dynamic_quantize(x)[0], w_qd,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32), x, K),
        }
        print(name, result[name], flush=True)

    # -- 2. dynamic_quantize alone -----------------------------------------
    x = jnp.asarray(rng.randn(S, 256).astype(np.float32))
    result["dynamic_quantize_us"] = per_iter_us(
        lambda x: dynamic_quantize(x)[0].astype(jnp.float32)
        * dynamic_quantize(x)[1], x, 256)
    print("dynamic_quantize", result["dynamic_quantize_us"], flush=True)

    # -- 3/4. full serving steps: float vs int8 params ---------------------
    body = ParametricModel.from_file_or_synthetic(None)
    net = MobilePoserNet(body)
    params_f = init_all_modules(jax.random.PRNGKey(0))
    params_q = quantize_params_int8(params_f)
    frames = jnp.asarray(rng.randn(N, S, 60).astype(np.float32) * 0.1)

    def carry_scalar(params):
        # device-resident state: a numpy state tree would re-upload every
        # leaf per timed call (the very artifact this script caught in the
        # int8 params, CLAUDE.md transfer-batching rule)
        st = jax.device_put(net.init_carry_state_batched(S))

        @jax.jit
        def run(params, st, frames):
            (pose, joints, root, contact), st = \
                net.forward_carry_sequence_batched(params, st, frames)
            return (pose.astype(jnp.float32).sum()
                    + joints.astype(jnp.float32).sum()
                    + root.astype(jnp.float32).sum()
                    + contact.astype(jnp.float32).sum())
        return lambda p: run(p, st, frames)

    def exact_scalar(params):
        st = jax.device_put(net.init_online_state_batched(S))

        @jax.jit
        def run(params, st, frames):
            (pose, joints, root, contact), st = \
                net.forward_online_sequence_batched(params, st, frames,
                                                    mode="scan")
            return (pose.astype(jnp.float32).sum()
                    + joints.astype(jnp.float32).sum()
                    + root.astype(jnp.float32).sum()
                    + contact.astype(jnp.float32).sum())
        return lambda p: run(p, st, frames)

    for mode, make in [("carry", carry_scalar), ("exact_scan", exact_scalar)]:
        row = {}
        for tag, p in [("float", params_f), ("int8", params_q)]:
            t = timed_fetch(make(p), p, reps=3)
            per_frame_us = max(t - rtt, 0.0) / N * 1e6
            row[tag + "_us_per_frame"] = round(per_frame_us, 1)
            row[tag + "_frames_per_sec"] = round(S * N / max(t - rtt, 1e-9))
        row["int8_vs_float"] = round(
            row["float_us_per_frame"] / max(row["int8_us_per_frame"], 1e-9), 3)
        result[mode] = row
        print(mode, row, flush=True)

    print(json.dumps(result), flush=True)
    if args.out:
        from benchmarks.reporting import merge_report
        merge_report(args.out, result, key="int8_microbench")
        print(f"report updated: {args.out}", flush=True)
    return result


if __name__ == "__main__":
    main()
