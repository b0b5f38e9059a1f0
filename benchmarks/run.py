"""Benchmark suite over the BASELINE.md config matrix.

Configs (driver BASELINE.json):
  1. dip_pose_only      — poser+joints offline path, lw_rp combo
  2. full_net_offline   — full 4-module net + translation fusion
  3. long_seq_drift     — TotalCapture-style long-sequence offline + drift
  4. combo_streaming    — all 12 combos batched streaming (batch-major)
  5. train_throughput   — per-module training step throughput

Run:  python benchmarks/run.py [--config all] [--out report.json]

Timing is transport-honest (benchmarks/timing.py): every benchmark chains R
iterations on device inside one jit region with a data dependency between
iterations, fetches one scalar, and subtracts the measured round trip —
naive per-call timing on a tunneled TPU measures the transport, and
`block_until_ready` alone under-reports.

Every chained dependency folds in a reduction over ALL outputs of the
benched program (pose, joints, translation, contact) so XLA cannot
dead-code-eliminate a branch — chaining only `tran` silently dropped the
poser->IK path (round-1 lesson). Where an analytic matmul-FLOP model
exists (benchmarks/flops.py) the result carries `model_flops_per_sec` and
`pct_of_peak` so implausible numbers are self-flagging.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.flops import (device_kind, forward_flops_per_frame,
                              mfu_fields, nominal_peak_for,
                              streaming_flops_per_emitted_frame,
                              training_flops_per_frame)
from benchmarks.timing import (chip_fingerprint, rtt_seconds, timed_fetch,
                               timed_fetch_stats)

# Set once per run in main() from the measured fingerprint; every MFU row
# then carries pct_of_chip (vs THIS chip) next to pct_of_peak (vs nominal)
# and the honesty flag fires on the chip-relative number (VERDICT r3 #3).
_CHIP_TFLOPS: float | None = None


def _timed(fn, *args, reps: int) -> tuple:
    """(median wall, {'wall_spread_pct': ...}) — same-process repeat spread
    embedded per row (VERDICT r2 weak #6: volatile rows must self-describe
    their confidence)."""
    st = timed_fetch_stats(fn, *args, reps=reps)
    return st["median"], {"wall_spread_pct": st["spread_pct"]}


def _flops_fields(frames_per_sec: float, flops_per_frame: float) -> dict:
    return mfu_fields(frames_per_sec * flops_per_frame,
                      chip_tflops=_CHIP_TFLOPS)


def _chained_stream_rate(forward, params, state, frames, rtt,
                         per_call_frames, target=0.4):
    """(frames/sec, spread_dict, R) with >= `target` device-seconds in the
    timed region.

    The fingerprint's calibration lesson (benchmarks/timing.py) applied to
    the streaming rows: a 10-120 ms program timed against a ~30-45 ms
    transport RTT measures RTT jitter, not the chip — the 2026-08-18
    matrix refresh recorded the carry row at HALF its chained rate and the
    int8 rows at 1/10th. Chain R repetitions inside ONE jit region with
    the streaming state threading between reps (a real data dependency)
    and every rep's outputs folded into the fetched scalar, so nothing is
    elided and RTT amortizes. Pilots at R=1; R is quantized to a power of
    two so the persistent compile cache stays reusable across runs."""
    def make_chained(R):
        @jax.jit
        def run(params, state, frames):
            def body(st, _):
                (pose, joints, root, contact), st2 = forward(
                    params, st, frames)
                s = (pose.astype(jnp.float32).sum()
                     + joints.astype(jnp.float32).sum()
                     + root.astype(jnp.float32).sum()
                     + contact.astype(jnp.float32).sum())
                return st2, s
            _, sums = jax.lax.scan(body, state, None, length=R)
            return sums.sum()
        return run

    wall, spread = _timed(make_chained(1), params, state, frames, reps=3)
    per = max(wall - rtt, 1e-9)
    R = 1
    if per < target:
        R = 1 << int(np.ceil(np.log2(min(max(target / per, 1.0), 256.0))))
        wall, spread = _timed(make_chained(R), params, state, frames,
                              reps=3)
    return per_call_frames * R / max(wall - rtt, 1e-9), spread, R


def _pilot_scaled_fori(make_run, base_R, rtt, *args, target=0.4):
    """(seconds-per-iteration, spread_dict, R) for a fori-chained bench:
    re-times with a power-of-two R if the pilot region ran under `target`
    device-seconds (same rationale as _chained_stream_rate)."""
    R = base_R
    wall, spread = _timed(make_run(R), *args, reps=3)
    per = max(wall - rtt, 1e-9)
    if per < target:
        R = 1 << int(np.ceil(np.log2(
            min(max(target / per * R, float(R)), 4096.0))))
        wall, spread = _timed(make_run(R), *args, reps=3)
        per = max(wall - rtt, 1e-9)
    return per / R, spread, R


def bench_dip_pose_only(net, params, rtt):
    """Config 1: joints+poser offline over DIP-length sequences, chained."""
    from mobileposer_tpu.models import module_apply
    from mobileposer_tpu.models.net import reduced_global_to_full
    T = 1024
    imu0 = jnp.asarray(np.random.RandomState(0).randn(T, 60), jnp.float32) * 0.1

    def make_run(R):
        @jax.jit
        def run(params, imu):
            def body(_, imu):
                x = imu[None]
                joints, _ = module_apply("joints", params["joints"], x,
                                         backend="auto")
                xx = jnp.concatenate([joints, x], axis=-1)
                r6d, _ = module_apply("poser", params["poser"], xx,
                                      backend="auto")
                pose = reduced_global_to_full(r6d.reshape(-1, 96),
                                              net.body_model)
                # chain dependency over ALL outputs so nothing is elided
                return imu + (pose.sum() + joints.sum()) * 1e-12
            return jax.lax.fori_loop(0, R, body, imu).sum()
        return run

    dt, spread, _ = _pilot_scaled_fori(make_run, 20, rtt, params, imu0)
    fps = T / dt
    # B=1 single sequence: the chip is latency-bound (sequential scan over
    # one stream cannot fill the MXU by construction), so this row reports
    # ms/sequence, NOT an MFU — pct_of_peak on a B=1 workload reads as an
    # unexplained perf gap next to the batched rows (VERDICT r3 #7). The
    # throughput framing for this program shape is eval_batched.
    return {"metric": "dip_pose_only_frames_per_sec", "value": round(fps, 1),
            **spread,
            "unit": "frames/s", "seq_len": T, "bound": "latency",
            "ms_per_sequence": round(dt * 1e3, 2),
            "batched_equivalent": "eval_batched"}


def _offline_all_outputs_dep(net, params, imu):
    pose, joints, tran, contact = net.forward_offline(params, imu)
    return (pose.sum() + joints.sum() + tran.sum() + contact.sum())


def bench_full_net_offline(net, params, rtt):
    """Config 2: full net + translation fusion, chained on device."""
    T = 1024
    imu0 = jnp.asarray(np.random.RandomState(1).randn(T, 60), jnp.float32) * 0.1

    def make_run(R):
        @jax.jit
        def run(params, imu):
            def body(_, imu):
                return imu + _offline_all_outputs_dep(net, params,
                                                      imu) * 1e-12
            return jax.lax.fori_loop(0, R, body, imu).sum()
        return run

    dt, spread, _ = _pilot_scaled_fori(make_run, 20, rtt, params, imu0)
    fps = T / dt
    # single-sequence, latency-bound: see bench_dip_pose_only
    return {"metric": "full_net_offline_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s", "seq_len": T,
            "bound": "latency", "ms_per_sequence": round(dt * 1e3, 2),
            "batched_equivalent": "eval_batched"}


def bench_long_seq_drift(net, params, rtt):
    """Config 3: TotalCapture-style long sequence + drift windows."""
    from mobileposer_tpu.evaluation import translation_drift
    T = 8192
    imu0 = jnp.asarray(np.random.RandomState(2).randn(T, 60), jnp.float32) * 0.1

    def make_run(R):
        @jax.jit
        def run(params, imu):
            def body(_, imu):
                return imu + _offline_all_outputs_dep(net, params,
                                                      imu) * 1e-12
            return jax.lax.fori_loop(0, R, body, imu).sum()
        return run

    dt, spread, _ = _pilot_scaled_fori(make_run, 5, rtt, params, imu0)
    _, _, tran_p, _ = jax.jit(net.forward_offline)(params, imu0)
    tran_t = np.cumsum(np.random.RandomState(3).randn(T, 3) * 0.01, axis=0)
    t0 = time.perf_counter()
    translation_drift(np.asarray(tran_p), tran_t)
    drift_s = time.perf_counter() - t0
    fps = T / dt
    return {"metric": "long_seq_offline_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s", "seq_len": T,
            "drift_eval_seconds": round(drift_s, 3),
            **_flops_fields(fps, forward_flops_per_frame())}


def bench_combo_streaming(net, params, rtt):
    """Config 4: all 12 combos batched streaming, batch-major."""
    from mobileposer_tpu.data import COMBO_MASKS, make_combo_imu
    users = 21
    n_streams = len(COMBO_MASKS) * users          # 252 streams
    n_frames = 100
    states = jax.tree_util.tree_map(
        jnp.asarray, net.init_online_state_batched(n_streams))

    rng = np.random.RandomState(4)
    acc = rng.randn(n_frames, n_streams, 5, 3).astype(np.float32) * 0.1
    ori = np.broadcast_to(np.eye(3, dtype=np.float32),
                          (n_frames, n_streams, 5, 3, 3))
    masks = np.repeat(COMBO_MASKS, users, axis=0)
    frames = jnp.asarray(np.asarray(make_combo_imu(
        jnp.asarray(acc), jnp.asarray(ori), jnp.asarray(masks)[None])))

    fps, spread, _ = _chained_stream_rate(
        net.forward_online_sequence_batched, params, states, frames, rtt,
        n_streams * n_frames)
    return {"metric": "combo_streaming_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s",
            "streams": n_streams, "combos": len(COMBO_MASKS),
            **_flops_fields(fps, streaming_flops_per_emitted_frame())}


def _train_batch(B, T, rng):
    """Synthetic training batch shared by every train-bench config."""
    return {
        "imu": jnp.asarray(rng.randn(B, T, 60), jnp.float32) * 0.1,
        "joints": jnp.asarray(rng.randn(B, T, 72), jnp.float32) * 0.1,
        "pose_r6d": jnp.tile(jnp.array([1, 0, 0, 0, 1, 0], jnp.float32),
                             (B, T, 24, 1)),
        "vels": jnp.asarray(rng.randn(B, T, 72), jnp.float32),
        "contacts": (jnp.asarray(rng.rand(B, T, 2)) > 0.5).astype(jnp.float32),
        "lengths": jnp.full((B,), T, jnp.int32),
    }


def _bench_train_modules(net, rtt, backend, metric):
    """Per-module timed train steps (windows/s + MFU + spread) for a given
    kernel backend — shared by train_throughput (f32 residuals) and
    train_bf16res."""
    from mobileposer_tpu.train import init_train_state, make_optimizer
    from mobileposer_tpu.train.trainer import loss_fn_for
    import optax
    B, T = 256, 125
    batch = _train_batch(B, T, np.random.RandomState(5))
    out, mfu, spreads = {}, {}, {}
    for name in ("joints", "poser", "footcontact", "velocity"):
        state = init_train_state(name, jax.random.PRNGKey(0), 1e-3)
        opt = make_optimizer(name, 1e-3)
        loss_fn = loss_fn_for(name,
                              net.body_model if name == "poser" else None,
                              backend=backend)

        def make_run(R, _loss_fn=loss_fn, _opt=opt):
            @jax.jit
            def run(params, opt_state, batch):
                def body(i, carry):
                    p, o = carry
                    key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                    loss, grads = jax.value_and_grad(
                        lambda pp: _loss_fn(pp, batch, key, train=True))(p)
                    updates, o = _opt.update(grads, o, p)
                    p = optax.apply_updates(p, updates)
                    return (p, o)
                p, o = jax.lax.fori_loop(0, R, body, (params, opt_state))
                return jax.tree_util.tree_leaves(p)[0].sum()
            return run

        dt, spread, _ = _pilot_scaled_fori(make_run, 10, rtt, state.params,
                                           state.opt_state, batch)
        out[name] = round(B / dt, 1)
        mfu[name] = _flops_fields(B / dt * T, training_flops_per_frame(name))
        spreads[name] = spread["wall_spread_pct"]
    return {"metric": metric, "value": out, "unit": "windows(125f)/s",
            "batch": B,
            "pct_of_peak": {n: f["pct_of_peak"] for n, f in mfu.items()},
            "pct_of_chip": {n: f.get("pct_of_chip") for n, f in mfu.items()},
            "wall_spread_pct": spreads}


def bench_train_throughput(net, params, rtt):
    """Config 5: training-step throughput per module (windows/sec), f32
    residuals (the 1e-5-pinned default kernels)."""
    return _bench_train_modules(net, rtt, "auto_train",
                                "train_windows_per_sec")


def bench_train_bf16res(net, params, rtt):
    """Per-module training throughput with bf16 stored residuals
    (backend='auto_train_bf16res'): the BPTT chain is bandwidth-bound on
    its residuals, so halving their bytes measured +14-27% per step
    (design.md §6.3); convergence validated identical to f32."""
    return _bench_train_modules(net, rtt, "auto_train_bf16res",
                                "train_bf16res_windows_per_sec")


def bench_train_concurrent(net, params, rtt):
    """Concurrent 4-module train step (make_multi_train_step): all modules
    advance on one batch in one jit region. On-device compute equals the
    sequential sum (measured 1.00x — the chip is serial either way); the
    end-to-end recipe win comes from 1 dispatch + 1 batch-assembly per
    batch instead of 4 (design.md §6.2 records the recipe-level A/B)."""
    from mobileposer_tpu.train import init_train_state
    from mobileposer_tpu.train.trainer import (MODULE_NAMES, make_optimizer,
                                               loss_fn_for)
    import optax
    B, T = 256, 125
    batch = _train_batch(B, T, np.random.RandomState(5))
    opts = {n: make_optimizer(n, 1e-3) for n in MODULE_NAMES}
    loss_fns = {n: loss_fn_for(n, net.body_model) for n in MODULE_NAMES}
    states = {n: init_train_state(n, jax.random.PRNGKey(0), 1e-3)
              for n in MODULE_NAMES}

    def make_run(R):
        @jax.jit
        def run(params_all, opt_all, batch):
            def body(i, carry):
                ps, os_ = carry
                key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                rngs = {n: jax.random.fold_in(key, j)
                        for j, n in enumerate(MODULE_NAMES)}

                def compute(ps):
                    return sum(loss_fns[n](ps[n], batch, rngs[n],
                                           train=True)
                               for n in MODULE_NAMES)

                _, grads = jax.value_and_grad(compute)(ps)
                new_ps, new_os = {}, {}
                for n in MODULE_NAMES:
                    updates, new_os[n] = opts[n].update(grads[n], os_[n],
                                                        ps[n])
                    new_ps[n] = optax.apply_updates(ps[n], updates)
                return (new_ps, new_os)
            ps, _ = jax.lax.fori_loop(
                0, R, body, (params_all, opt_all))
            return sum(jax.tree_util.tree_leaves(ps[n])[0].sum()
                       for n in MODULE_NAMES)
        return run

    params_all = {n: states[n].params for n in MODULE_NAMES}
    opt_all = {n: states[n].opt_state for n in MODULE_NAMES}
    dt, spread, _ = _pilot_scaled_fori(make_run, 10, rtt, params_all,
                                       opt_all, batch)
    total_flops = T * sum(training_flops_per_frame(n) for n in MODULE_NAMES)
    return {"metric": "train_concurrent_windows_per_sec",
            "value": round(B / dt, 1), **spread,
            "unit": "windows(125f)/s, all 4 modules per window", "batch": B,
            **_flops_fields(B / dt, total_flops)}


def bench_carry_streaming(net, params, rtt):
    """Opt-in carry-mode streaming (models/streaming.py): the documented
    approximation of the window semantics — forward states carried,
    backward over the 5-frame tail only (~15x fewer FLOPs per frame)."""
    from benchmarks.flops import carry_flops_per_emitted_frame
    S, N = 256, 100
    state = jax.tree_util.tree_map(
        jnp.asarray, net.init_carry_state_batched(S))

    frames = jnp.asarray(
        np.random.RandomState(7).randn(N, S, 60).astype(np.float32) * 0.1)
    fps, spread, _ = _chained_stream_rate(
        net.forward_carry_sequence_batched, params, state, frames, rtt,
        S * N)

    # bf16 weights + state + frames: carry mode is VPU/bandwidth-bound, so
    # bf16 nearly doubles it (measured 1.74x) — unlike the exact path
    from mobileposer_tpu.nn import cast_params
    params_bf = cast_params(params, jnp.bfloat16)
    state_bf = jax.tree_util.tree_map(
        jnp.asarray, net.init_carry_state_batched(S, dtype=jnp.bfloat16))

    fps_bf, spread_bf, _ = _chained_stream_rate(
        net.forward_carry_sequence_batched, params_bf, state_bf,
        frames.astype(jnp.bfloat16), rtt, S * N)
    cflops = carry_flops_per_emitted_frame()
    bf = _flops_fields(fps_bf, cflops)
    return {"metric": "carry_mode_frames_per_sec", "value": round(fps, 1),
            **spread, "bf16_wall_spread_pct": spread_bf["wall_spread_pct"],
            "unit": "frames/s", "streams": S, "exact_semantics": False,
            "bf16_frames_per_sec": round(fps_bf, 1),
            "bf16_pct_of_peak": bf["pct_of_peak"],
            "bf16_pct_of_chip": bf.get("pct_of_chip"),
            **_flops_fields(fps, cflops)}


def bench_datagen(net, params, rtt):
    """Config 5 support: AMASS virtual-IMU synthesis throughput (the
    reference's per-frame Python loops in process.py:23-46 as one jitted
    on-device pipeline: FK + 6890-vertex LBS + accel stencil + contacts).
    Uses the same body the rest of the matrix runs (synthetic fixture when
    the SMPL blob is absent — vertex count matches whatever is loaded)."""
    from mobileposer_tpu.data.synthesis import synthesize_virtual_imu
    T = 1024
    rng = np.random.RandomState(11)
    aa = rng.randn(T, 24, 3).astype(np.float32) * 0.2
    from mobileposer_tpu.kinematics import rotation as Rt
    # fixture synthesis under jit (eager device math over the tunnel pays
    # a remote compile per op — CLAUDE.md)
    pose0 = jax.jit(lambda a: Rt.axis_angle_to_rotation_matrix(
        a.reshape(-1, 3)).reshape(T, 24, 3, 3))(aa)

    def make_run(R):
        @jax.jit
        def run(pose):
            def body(_, pose):
                out = synthesize_virtual_imu(net.body_model, pose)
                dep = (out["joint"].sum() + out["vacc"].sum()
                       + out["vrot"].sum() + out["contact"].sum())
                return pose + dep * 1e-12
            return jax.lax.fori_loop(0, R, body, pose).sum()
        return run

    dt, spread, _ = _pilot_scaled_fori(make_run, 5, rtt, pose0)
    return {"metric": "datagen_frames_per_sec", "value": round(T / dt, 1),
            **spread,
            "unit": "frames/s", "seq_len": T,
            "num_vertices": net.body_model.num_vertices}


def bench_eval_batched(net, params, rtt):
    """Dataset-evaluation throughput: a padded ragged batch of sequences
    through the full 4-module forward (the shape _predict_offline_batched
    runs: max_batch x 512-frame buckets with per-sequence lengths).
    Ragged bidirectional layers route through the masked pallas kernel
    under backend='auto' (measured 3.6x vs the masked XLA scan)."""
    from mobileposer_tpu.models.net import forward
    B, T = 64, 512
    rng = np.random.RandomState(9)
    imu = jnp.asarray(rng.randn(B, T, 60), jnp.float32) * 0.1
    lengths = jnp.asarray(rng.randint(T // 3, T + 1, B), jnp.int32)

    def make_run(R):
        @jax.jit
        def run(params, imu):
            def body(_, imu):
                pose, joints, vel, contact, _ = forward(params, imu,
                                                        net.body_model,
                                                        lengths=lengths)
                dep = (pose.sum() + joints.sum() + vel.sum()
                       + contact.sum())
                return imu + dep * 1e-12
            return jax.lax.fori_loop(0, R, body, imu).sum()
        return run

    dt, spread, _ = _pilot_scaled_fori(make_run, 5, rtt, params, imu)
    valid = int(np.asarray(lengths).sum())
    fps = valid / dt
    return {"metric": "eval_batched_frames_per_sec", "value": round(fps, 1),
            **spread,
            "unit": "valid frames/s", "batch": B, "bucket": T,
            **_flops_fields(fps, forward_flops_per_frame())}


def bench_carry_max_throughput(net, params, rtt):
    """Max-throughput serving config: carry mode, bf16, S=1024 streams
    (measured sweet spot — S=2048 plateaus, exact mode prefers S=256).
    Single-chip ceiling for fleet-style serving."""
    from benchmarks.flops import carry_flops_per_emitted_frame
    from mobileposer_tpu.nn import cast_params
    S, N = 1024, 100
    params_bf = cast_params(params, jnp.bfloat16)
    state = jax.tree_util.tree_map(
        jnp.asarray, net.init_carry_state_batched(S, dtype=jnp.bfloat16))

    frames = jnp.asarray(
        np.random.RandomState(8).randn(N, S, 60).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fps, spread, _ = _chained_stream_rate(
        net.forward_carry_sequence_batched, params_bf, state, frames, rtt,
        S * N)
    return {"metric": "carry_bf16_max_throughput_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s", "streams": S,
            "exact_semantics": False,
            **_flops_fields(fps, carry_flops_per_emitted_frame())}


def bench_carry_int8(net, params, rtt):
    """Carry mode with W8A8 LSTM matmuls (ops/quant.py) at the
    max-throughput configuration (S=1024, bf16 state/linears/frames) —
    the int8 A/B against carry_max_throughput. The MXU runs int8 at 2x
    the bf16 rate (v5e: 394 int8 TOPS), so MFU fields are emitted
    against the DOUBLED nominal peak and the doubled chip fingerprint
    (the fingerprint measures the bf16 matmul rate; int8 capability is
    2x it on every TPU generation with an int8 MXU path)."""
    from benchmarks.flops import carry_flops_per_emitted_frame, nominal_peak_for
    from mobileposer_tpu.ops.quant import quantize_params_int8
    S, N = 1024, 100
    # host-side: bf16-cast the float leaves (linears; numpy via ml_dtypes —
    # no device round trip in setup), then quantize the LSTM kernels from
    # the original precision so dequant scales stay f32
    params_bf = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16), params)
    params_q = quantize_params_int8(params_bf)
    state = jax.tree_util.tree_map(
        jnp.asarray, net.init_carry_state_batched(S, dtype=jnp.bfloat16))

    frames = jnp.asarray(
        np.random.RandomState(8).randn(N, S, 60).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fps, spread, _ = _chained_stream_rate(
        net.forward_carry_sequence_batched, params_q, state, frames, rtt,
        S * N)
    fields = mfu_fields(
        fps * carry_flops_per_emitted_frame(),
        chip_tflops=2.0 * _CHIP_TFLOPS if _CHIP_TFLOPS else None,
        peak=2.0 * nominal_peak_for())
    return {"metric": "carry_int8_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s", "streams": S,
            "exact_semantics": False, "quant": "W8A8 dynamic, LSTM matmuls",
            "peak_basis": "2x bf16 nominal/fingerprint (int8 MXU rate)",
            **fields}


def bench_exact_int8(net, params, rtt):
    """Exact window semantics with W8A8 LSTM matmuls (nn/lstm.py int8
    routing: int8 input projections + int8 Pallas window kernels) at the
    exact-headline configuration (S=256, bf16 state/linears/frames) —
    the int8 A/B against the streaming headline. MFU fields against the
    DOUBLED peak/fingerprint, like carry_int8."""
    from benchmarks.flops import nominal_peak_for
    from mobileposer_tpu.ops.quant import quantize_params_int8
    S, N = 256, 100
    params_bf = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(jnp.bfloat16), params)
    params_q = quantize_params_int8(params_bf)
    state = jax.tree_util.tree_map(
        jnp.asarray, net.init_online_state_batched(S, dtype=jnp.bfloat16))

    frames = jnp.asarray(
        np.random.RandomState(9).randn(N, S, 60).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    fps, spread, _ = _chained_stream_rate(
        net.forward_online_sequence_batched, params_q, state, frames, rtt,
        S * N)
    fields = mfu_fields(
        fps * streaming_flops_per_emitted_frame(),
        chip_tflops=2.0 * _CHIP_TFLOPS if _CHIP_TFLOPS else None,
        peak=2.0 * nominal_peak_for())
    return {"metric": "exact_int8_frames_per_sec", **spread,
            "value": round(fps, 1), "unit": "frames/s", "streams": S,
            "exact_semantics": True, "quant": "W8A8 dynamic, LSTM matmuls",
            "peak_basis": "2x bf16 nominal/fingerprint (int8 MXU rate)",
            **fields}


def bench_stream_latency(net, params, rtt):
    """Single-stream per-frame device latency (the real-time metric: one
    frame must fit in the 33 ms budget of a 30 Hz stream). mode='auto'
    routes S=1 through the unfolded-window path (6.6x lower latency than
    the per-frame scan, identical outputs)."""
    N = 100
    state = jax.tree_util.tree_map(
        jnp.asarray, net.init_online_state_batched(1))

    frames = jnp.asarray(
        np.random.RandomState(6).randn(N, 1, 60).astype(np.float32) * 0.1)
    fps, spread, _ = _chained_stream_rate(
        net.forward_online_sequence_batched, params, state, frames, rtt, N)
    per_frame_ms = 1e3 / fps
    return {"metric": "single_stream_latency_ms", "value": round(per_frame_ms, 3),
            **spread,
            "unit": "ms/frame", "budget_ms_at_30fps": 33.3}


CONFIGS = {
    "dip_pose_only": bench_dip_pose_only,
    "full_net_offline": bench_full_net_offline,
    "long_seq_drift": bench_long_seq_drift,
    "combo_streaming": bench_combo_streaming,
    "train_throughput": bench_train_throughput,
    "train_concurrent": bench_train_concurrent,
    "train_bf16res": bench_train_bf16res,
    "stream_latency": bench_stream_latency,
    "carry_streaming": bench_carry_streaming,
    "carry_max_throughput": bench_carry_max_throughput,
    "carry_int8": bench_carry_int8,
    "exact_int8": bench_exact_int8,
    "eval_batched": bench_eval_batched,
    "datagen": bench_datagen,
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="all",
                        choices=["all"] + list(CONFIGS.keys()))
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    net = MobilePoserNet(ParametricModel.from_file_or_synthetic(None))
    params = init_all_modules(jax.random.PRNGKey(0))
    rtt = rtt_seconds()

    names = list(CONFIGS) if args.config == "all" else [args.config]
    fp = chip_fingerprint(rtt=rtt)
    global _CHIP_TFLOPS
    _CHIP_TFLOPS = fp["matmul_bf16_tflops"]
    kind = device_kind()
    report = {"device": str(jax.devices()[0]), "device_kind": kind,
              "nominal_peak_tflops": round(nominal_peak_for(kind) / 1e12, 1),
              "rtt_ms": round(rtt * 1e3, 2), **fp}
    for name in names:
        # one failing config (e.g. a chip-specific int8 lowering failure)
        # must cost its row, not the rest of the matrix or the --out merge
        try:
            result = CONFIGS[name](net, params, rtt)
        except Exception as e:
            result = {"metric": name,
                      "error": f"{type(e).__name__}: {e}"[:300]}
        report[name] = result
        print(json.dumps({name: result}), flush=True)
    if args.out:
        # merge into an existing report: keys written by other tools (e.g.
        # carry_accuracy_ab from scripts/carry_ab.py) must survive a matrix
        # refresh
        from benchmarks.reporting import merge_report
        merge_report(args.out, report)
    return report


if __name__ == "__main__":
    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    main()
