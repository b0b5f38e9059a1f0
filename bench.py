"""Headline benchmark: streamed IMU frames/sec/chip.

North-star metric (BASELINE.md): >= 10,000 streamed frames/sec/chip on TPU
v5e-1. The reference's streaming path re-runs a 45-frame window through all
four modules per frame on GPU (reference net.py:174-219); here the same
semantics run as a device-resident `lax.scan` over frames (one dispatch for
the whole run) with many independent streams batched via vmap.

Honesty requirements (round-2 hardening):
  * the timed program returns a reduction over ALL FOUR outputs (pose,
    joints, translation, contact) so XLA cannot dead-code-eliminate the
    poser/IK path — an earlier version summed only `root` and measured a
    program 12x smaller than serving actually runs;
  * timing is transport-honest: the whole frame loop executes inside one
    jit region, a single scalar is fetched at the end, and the measured
    transport round trip is subtracted (benchmarks/timing.py — on tunneled
    devices `block_until_ready` alone under-reports);
  * the JSON line carries an analytic matmul-FLOP model
    (benchmarks/flops.py) -> `model_flops_per_sec` and `pct_of_peak`, so an
    implied MFU above chip peak would flag a broken harness, not a fast
    chip;
  * BENCH_CHECKS=1 additionally runs (a) a linearity check (4x the frames
    must take ~4x the device time) and (b) a device-resident chained
    repetition (R runs serialized by a data dependency inside one jit) and
    embeds both ratios in the JSON line.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_FPS = 10_000.0  # north-star target, frames/sec/chip


def ensure_backend_reachable(timeout_s: float = 240.0) -> str | None:
    """Probe device discovery in a SUBPROCESS with a hard timeout.

    Over the axon tunnel, `jax.devices()` does not fail when the tunnel is
    down — it blocks forever (observed outage 2026-08-17), which would hang
    the driver's round-end bench run with no JSON line at all. An in-process
    watchdog thread can't be trusted to preempt a PJRT client init that
    holds the GIL, so the probe runs the exact discovery this process is
    about to do in a child with a kill timeout. Returns None when reachable,
    else a short error string. Set BENCH_NO_PROBE=1 to skip (saves ~5-15 s
    when the backend is known-good)."""
    if os.environ.get("BENCH_NO_PROBE", "0") == "1":
        return None
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return f"device discovery hung > {timeout_s:.0f}s (tunnel down?)"
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["no stderr"]
        return f"device discovery failed rc={r.returncode}: {tail[0][:200]}"
    return None


def main():
    from benchmarks.flops import (device_kind, mfu_fields, nominal_peak_for,
                                  streaming_flops_per_emitted_frame)
    from benchmarks.timing import rtt_seconds, timed_fetch
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules

    n_streams = int(os.environ.get("BENCH_STREAMS", "256"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "100"))
    run_checks = os.environ.get("BENCH_CHECKS", "0") == "1"

    body = ParametricModel.from_file_or_synthetic(None)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))

    # state lives on device in steady-state serving: place it once so the
    # timed region measures compute, not a per-call host->device upload
    # single batched placement (per-leaf jnp.asarray pays an eager
    # dispatch per leaf over the tunnel)
    states = jax.device_put(net.init_online_state_batched(n_streams))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.randn(n_frames, n_streams, 60).astype(np.float32) * 0.1)

    rtt = rtt_seconds()

    # R chained repetitions of the streaming program in ONE jit region:
    # the state threads between reps (a real data dependency) and every
    # rep's outputs fold into the fetched scalar, so nothing can be
    # elided and RTT jitter amortizes over >= `target` seconds of device
    # time. This is the fingerprint's calibration lesson applied to the
    # streaming legs: at 100 frames the carry program ran ~9 ms against a
    # ~36 ms transport RTT, and the "measured" rate was transport noise —
    # the 2026-08-18 matrix recorded a carry MFU of 152% of the chip's
    # own matmul rate, a flagged impossibility.
    def make_chained(forward, R):
        @jax.jit
        def run_chained(params, states, frames):
            def body(st, _):
                (pose, joints, root, contact), st2 = forward(
                    params, st, frames)
                s = (pose.astype(jnp.float32).sum()
                     + joints.astype(jnp.float32).sum()
                     + root.astype(jnp.float32).sum()
                     + contact.astype(jnp.float32).sum())
                return st2, s
            _, sums = jax.lax.scan(body, states, None, length=R)
            return sums.sum()
        return run_chained

    def chained_rate(forward, params_, states_, frames_, target=0.4):
        """frames/sec with >= target device-seconds in the timed region.

        Pilots at R=1; if under target, repeats with R quantized to a
        power of two (each distinct R is a distinct traced program — the
        quantization keeps the persistent compile cache reusable)."""
        per_call = n_streams * n_frames
        wall = timed_fetch(make_chained(forward, 1), params_, states_,
                           frames_, reps=3)
        per = max(wall - rtt, 1e-9)
        if per >= target:
            return per_call / per
        R = 1 << int(np.ceil(np.log2(min(max(target / per, 1.0), 256.0))))
        wall = timed_fetch(make_chained(forward, R), params_, states_,
                           frames_, reps=3)
        return per_call * R / max(wall - rtt, 1e-9)

    def exact_forward(params, st, frames):
        return net.forward_online_sequence_batched(params, st, frames)

    # measured chip-speed fingerprint (calibrated to >=0.5 s of device time
    # — the old 45 ms version was dominated by RTT jitter and read 154-339
    # "TFLOP/s" on identical chips). Every MFU below carries pct_of_chip
    # against it, and the >100% honesty guard fires on that chip-relative
    # number, so a pool chip measuring above the nominal constant can no
    # longer silently break the guard (VERDICT r3 #3).
    from benchmarks.timing import chip_fingerprint
    chip_tf = chip_fingerprint(rtt=rtt)["matmul_bf16_tflops"]
    kind = device_kind()
    peak = nominal_peak_for(kind)

    def _mfu(fps, fpf):
        return mfu_fields(fps * fpf, chip_tflops=chip_tf, peak=peak)

    fps = chained_rate(exact_forward, params, states, frames)
    dev = n_streams * n_frames / fps

    flops_per_frame = streaming_flops_per_emitted_frame()
    result = {
        "metric": "streamed_imu_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "model_flops_per_frame": round(flops_per_frame),
        **_mfu(fps, flops_per_frame),
        "streams": n_streams,
        "frames": n_frames,
        "rtt_seconds": round(rtt, 4),
        "device_seconds": round(dev, 4),
        "device_kind": kind,
        "nominal_peak_tflops": round(peak / 1e12, 1),
        "chip_bf16_matmul_tflops": chip_tf,
    }

    # bf16 exact semantics (same windowed program, bf16 weights/state):
    # a non-win before the lane-major IK change, +7% after it (the VPU
    # share of the step shrank, so the MXU's bf16 rate shows through).
    # One bf16 params/frames pair serves this and the carry block below
    # (per-leaf eager casts over the tunnel pay remote compiles).
    from mobileposer_tpu.nn import cast_params
    params_bf = cast_params(params, jnp.bfloat16)
    frames_bf = frames.astype(jnp.bfloat16)
    states_xbf = jax.device_put(
        net.init_online_state_batched(n_streams, dtype=jnp.bfloat16))

    fps_xb = chained_rate(exact_forward, params_bf, states_xbf, frames_bf)
    result["exact_bf16_frames_per_sec"] = round(fps_xb, 1)
    xb = _mfu(fps_xb, flops_per_frame)
    result["exact_bf16_pct_of_peak"] = xb["pct_of_peak"]
    result["exact_bf16_pct_of_chip"] = xb.get("pct_of_chip")

    # exact semantics + W8A8 int8 LSTM matmuls (ops/quant.py): int8 input
    # projections and int8 Pallas window kernels (nn/lstm.py routing).
    # MFU fields against the DOUBLED peak/fingerprint (int8 MXU rate).
    # Guarded: the int8 kernels' Mosaic lowering is chip/jax-version
    # sensitive (scripts/int8_tpu_smoke.py is the gate) — a lowering
    # failure must cost this leg, not the headline JSON line.
    from mobileposer_tpu.ops.quant import quantize_params_int8
    params_q = quantize_params_int8(params_bf)
    xq = {}
    try:
        # states_xbf is reusable: each rep re-derives it via the chain
        fps_xq = chained_rate(exact_forward, params_q, states_xbf,
                              frames_bf)
        result["exact_int8_frames_per_sec"] = round(fps_xq, 1)
        xq = mfu_fields(fps_xq * flops_per_frame, chip_tflops=2.0 * chip_tf,
                        peak=2.0 * peak)
        result["exact_int8_pct_of_peak"] = xq["pct_of_peak"]
        result["exact_int8_pct_of_chip"] = xq.get("pct_of_chip")
        result["exact_int8_peak_basis"] = (
            "2x bf16 nominal/fingerprint (int8 MXU rate)")
    except Exception as e:  # pragma: no cover - chip-specific lowering
        result["exact_int8_error"] = f"{type(e).__name__}: {e}"[:300]

    # Opt-in carry-mode streaming (models/streaming.py): forward states
    # carried across frames, backward recomputed over the 5-frame tail only
    # — an approximation of the window semantics with ~15x fewer FLOPs.
    # Reported alongside the exact headline, never as it.
    cstates = jax.device_put(net.init_carry_state_batched(n_streams))

    from benchmarks.flops import carry_flops_per_emitted_frame
    cflops = carry_flops_per_emitted_frame()
    fps_c = chained_rate(net.forward_carry_sequence_batched,
                         params, cstates, frames)
    result["carry_mode_frames_per_sec"] = round(fps_c, 1)
    cm = _mfu(fps_c, cflops)
    result["carry_mode_pct_of_peak"] = cm["pct_of_peak"]
    result["carry_mode_pct_of_chip"] = cm.get("pct_of_chip")

    # carry + bf16 weights/state/frames — the max-throughput serving
    # configuration (reuses the bf16 params/frames pair from above).
    cstates_bf = jax.device_put(
        net.init_carry_state_batched(n_streams, dtype=jnp.bfloat16))

    fps_cb = chained_rate(net.forward_carry_sequence_batched,
                          params_bf, cstates_bf, frames_bf)
    result["carry_mode_bf16_frames_per_sec"] = round(fps_cb, 1)
    cb = _mfu(fps_cb, cflops)
    result["carry_mode_bf16_pct_of_peak"] = cb["pct_of_peak"]
    result["carry_mode_bf16_pct_of_chip"] = cb.get("pct_of_chip")

    # carry + W8A8 int8 LSTM matmuls — MFU fields against the DOUBLED
    # peak/fingerprint like the exact int8 leg above. Reuses params_q and
    # the bf16 frames; run_carry_bf retraces on the int8 param dtypes.
    # Guarded like the exact int8 leg (this one is pure XLA, but the
    # int8 dot_general path is still chip/version sensitive).
    cq = {}
    try:
        cstates_q = jax.device_put(
            net.init_carry_state_batched(n_streams, dtype=jnp.bfloat16))
        fps_cq = chained_rate(net.forward_carry_sequence_batched,
                              params_q, cstates_q, frames_bf)
        result["carry_mode_int8_frames_per_sec"] = round(fps_cq, 1)
        cq = mfu_fields(fps_cq * cflops, chip_tflops=2.0 * chip_tf,
                        peak=2.0 * peak)
        result["carry_mode_int8_pct_of_peak"] = cq["pct_of_peak"]
        result["carry_mode_int8_pct_of_chip"] = cq.get("pct_of_chip")
        result["carry_mode_int8_peak_basis"] = (
            "2x bf16 nominal/fingerprint (int8 MXU rate)")
    except Exception as e:  # pragma: no cover - chip-specific lowering
        result["carry_mode_int8_error"] = f"{type(e).__name__}: {e}"[:300]

    if any("honesty_flag" in d
           for d in (xb, xq, cm, cb, cq)) or "honesty_flag" in result:
        result["honesty_flag"] = "an MFU exceeds this chip's measured matmul rate"

    if run_checks:
        run1 = make_chained(exact_forward, 1)
        # Linearity: 4x frames must cost ~4x device time (a sublinear ratio
        # means the harness, not the chip, made the number).
        frames4 = jnp.asarray(
            rng.randn(4 * n_frames, n_streams, 60).astype(np.float32) * 0.1)
        dev1 = max(timed_fetch(run1, params, states, frames) - rtt, 1e-9)
        dev4 = max(timed_fetch(run1, params, states, frames4) - rtt, 1e-9)
        result["linearity_x4"] = round(dev4 / dev1, 3)

        # Single-call vs chained agreement: the headline rate came from
        # the R-chained program; one un-chained call must imply the same
        # rate to within transport noise (rules out scan/async artifacts).
        result["chained_per_run_ratio"] = round(
            (n_streams * n_frames / dev1) / fps, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # persistent compile cache (host-feature-keyed): bench runs 4 timed
    # configs whose compiles dominate cold wall time; repeat invocations
    # (driver round-end runs) hit the cache
    err = ensure_backend_reachable()
    if err is not None:
        # one honest JSON line instead of an indefinite hang: the driver
        # records the failure and the round still produces an artifact
        print(json.dumps({
            "metric": "streamed_imu_frames_per_sec_per_chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0, "error": err}))
        sys.exit(0)
    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    main()
