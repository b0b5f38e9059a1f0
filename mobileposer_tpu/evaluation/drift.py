"""Stream-age drift characterization for streaming modes.

Carry-mode streaming (models/streaming.py) deliberately never resets its
forward LSTM states, so its divergence from the exact windowed semantics
(reference net.py:174-219) could in principle grow with stream age. The
accuracy label from evaluate_pose A/Bs covers T~10^2 sequences; serving
targets 10^5-10^6-frame stream lifetimes. This module measures accuracy AS
A FUNCTION OF STREAM AGE: it streams S independent synthetic motions
through a streaming mode window-by-window with the state carried across
windows, computing per-window SIP (masked global angle error, deg) and
root-aligned joint position error (cm) against ground truth on device —
only two [S] scalars leave the chip per window, so horizons of 10^5+
frames are cheap even over a tunneled transport.

Used by scripts/carry_drift.py (full-horizon characterization on real
hardware; results in benchmarks/report_v5e1.json "carry_drift_horizon")
and tests/test_carry_drift.py (CI bound at a shorter horizon).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R

_MASK = np.asarray(C.EVAL_JOINT_MASK)


def make_stream_motion(rng: np.random.Generator, n_frames: int, n_streams: int,
                       step_std: float = 0.02, theta: float = 0.01,
                       pose_std: float = 0.35) -> Tuple[np.ndarray, np.ndarray]:
    """Smooth STATIONARY random motions for S independent streams.

    Pose is a mean-reverting (Ornstein-Uhlenbeck) walk around the neutral
    pose rather than a free random walk: a free cumsum's variance grows
    linearly with stream age, so by frame ~10^4 the motion is far outside
    any training distribution and BOTH streaming modes degrade — an
    out-of-distribution artifact that would masquerade as age drift. The
    OU process keeps per-joint axis-angle components at a stationary
    ~pose_std rad with a ~1/theta-frame correlation time (matching the
    amplitude of the training fixtures' short cumsum walks), so windows at
    frame 10^5 are statistically identical to windows at frame 10^3 and
    any measured metric drift is attributable to the streaming state.

    Returns (aa [N, S, 24, 3] axis-angle local pose, tran [N, S, 3]) as
    float32 numpy — the compact GT representation (rotation matrices for
    10^5 frames would be ~9x the bytes; windows convert on device).
    """
    sigma = pose_std * np.sqrt(2 * theta - theta * theta)
    noise = rng.normal(0.0, sigma, (n_frames, n_streams, 24, 3))
    aa = np.zeros((n_frames, n_streams, 24, 3), np.float32)
    x = rng.normal(0.0, pose_std, (n_streams, 24, 3))       # stationary init
    for t in range(n_frames):
        x = (1.0 - theta) * x + noise[t]
        aa[t] = x
    # translation: OU VELOCITY integrated to a position (position itself may
    # wander — the model only consumes accelerations and the metrics are
    # root-aligned, but a bounded velocity keeps the virtual accelerometer
    # stationary)
    vel_noise = rng.normal(0.0, 0.01 * np.sqrt(2 * theta),
                           (n_frames, n_streams, 3))
    tran = np.zeros((n_frames, n_streams, 3), np.float32)
    v = np.zeros((n_streams, 3))
    pos = np.zeros((n_streams, 3))
    for t in range(n_frames):
        v = (1.0 - theta) * v + vel_noise[t]
        pos = pos + v
        tran[t] = pos
    return aa, tran


def synthesize_stream_frames(body_model, aa: np.ndarray, tran: np.ndarray,
                             combo: str = "lw_rp",
                             chunk: int = 2048) -> jnp.ndarray:
    """Virtual-IMU model inputs [N, S, 60] for the GT motions, on device.

    Runs the real synthesis pipeline (data/synthesis.py — FK + LBS +
    accel stencil) per stream in fixed-size chunks with 8-frame overlap so
    the finite-difference accelerometer stencil sees continuous context at
    chunk joins (the stencil reaches +-smooth_n=4 frames; the reference's
    zero-padded boundary frames appear only at the true stream start/end).
    Inputs are masked+flattened exactly like the dataset path
    (acc/acc_scale, combo zero-mask, [acc15|ori45] concat).
    """
    from mobileposer_tpu.data.dataset import COMBO_MASKS, COMBO_NAMES
    from mobileposer_tpu.data.synthesis import synthesize_virtual_imu

    mask = jnp.asarray(COMBO_MASKS[COMBO_NAMES.index(combo)])
    pad = 8
    N, S = aa.shape[:2]

    @jax.jit
    def synth_chunk(aa_c, tran_c):
        """[T, 24, 3] axis-angle -> [T, 60] masked imu features."""
        pose = R.axis_angle_to_rotation_matrix(
            aa_c.reshape(-1, 3)).reshape(-1, 24, 3, 3)
        out = synthesize_virtual_imu(body_model, pose, tran=tran_c)
        acc = out["vacc"][:, :5] / C.amass.acc_scale
        ori = out["vrot"][:, :5]
        a = acc * mask[None, :, None]
        o = ori * mask[None, :, None, None]
        return jnp.concatenate([a.reshape(-1, 15), o.reshape(-1, 45)], axis=1)

    # Chunks are cut at their NATURAL lengths — no repeat-padding: padding
    # the tail with a frozen last frame would give the final frames a full
    # wide-stencil acceleration over fake motion instead of the
    # reference's zero-acc stream-end boundary. jit caches by shape, so
    # the whole run compiles at most 3 programs (first / interior / tail).
    frames = np.zeros((N, S, 60), np.float32)
    for s in range(S):
        for t0 in range(0, N, chunk):
            lo = max(t0 - pad, 0)
            hi = min(t0 + chunk + pad, N)
            f = np.asarray(synth_chunk(jnp.asarray(aa[lo:hi, s]),
                                       jnp.asarray(tran[lo:hi, s])))
            inner0 = t0 - lo
            frames[t0:min(t0 + chunk, N), s] = f[
                inner0:inner0 + min(chunk, N - t0)]
    return jnp.asarray(frames)


def make_window_stepper(net, params, mode: str):
    """Jitted (state, frames_w [W,S,60], aa_w [W,S,24,3]) ->
    (state, sip_deg [S], pos_cm [S], tran_p [W,S,3]).

    Streams one window with the carried state and computes the windowed
    metrics against GT on device: SIP = geodesic global-rotation error at
    the EVAL_JOINT_MASK joints (deg, reference evaluate.py:18), pos =
    root-aligned joint position error over all 24 joints (cm). The
    predicted root trajectory is also returned (device-resident; the
    caller batches the fetch) for the 1-7 m translation-drift windows —
    the one output a long-lived stream ACCUMULATES (the fusion anchors
    never reset, models/streaming.py), so it is the most plausibly
    age-sensitive metric.
    """
    body = net.body_model
    mask = jnp.asarray(_MASK)

    @jax.jit
    def step(state, frames_w, aa_w):
        if mode == "exact":
            (pose, _, tran_p, _), state = net.forward_online_sequence_batched(
                params, state, frames_w)
        elif mode == "carry":
            (pose, _, tran_p, _), state = net.forward_carry_sequence_batched(
                params, state, frames_w)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        W, S = frames_w.shape[:2]
        gt_pose = R.axis_angle_to_rotation_matrix(
            aa_w.reshape(-1, 3)).reshape(W * S, 24, 3, 3)
        gt_g, gt_j = body.forward_kinematics(gt_pose)
        pr_g, pr_j = body.forward_kinematics(
            pose.astype(jnp.float32).reshape(W * S, 24, 3, 3))
        # geodesic angle per masked joint
        m = jnp.einsum("njab,njac->njbc", gt_g[:, mask], pr_g[:, mask])
        tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
        ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
        sip = ang.reshape(W, S, -1).mean(axis=(0, 2))
        # root-aligned positional error, cm
        off = gt_j[:, :1] - pr_j[:, :1]
        pe = jnp.linalg.norm(pr_j + off - gt_j, axis=-1) * 100.0
        pos = pe.reshape(W, S, 24).mean(axis=(0, 2))
        return state, sip, pos, tran_p.astype(jnp.float32)

    return step


def windowed_stream_metrics(net, params, frames: jnp.ndarray, aa: np.ndarray,
                            mode: str, window: int,
                            dtype=jnp.float32,
                            tran_gt: Optional[np.ndarray] = None) -> dict:
    """Stream [N,S,60] frames through `mode` in N//window windows with the
    state carried across windows; returns per-window metric curves.

    Returns {"sip_deg": [n_windows, S], "pos_cm": [n_windows, S]} numpy;
    with `tran_gt` ([N, S, 3] GT root trajectory, the second output of
    make_stream_motion) it adds the reference's 1-7 m translation-drift
    windows (evaluate.py:66-92 semantics via pose_eval.translation_drift)
    PER STREAM-AGE WINDOW: "tran_drift_m" [n_windows, S] is each window's
    mean normalized drift over the 1-7 m window sizes, and
    "tran_drift_per_w" maps each window size to its [n_windows]
    stream-mean curve.
    """
    N, S = frames.shape[:2]
    n_windows = N // window
    if mode == "exact":
        state = jax.device_put(net.init_online_state_batched(S, dtype=dtype))
    else:
        state = jax.device_put(net.init_carry_state_batched(S, dtype=dtype))
    step = make_window_stepper(net, params, mode)
    sips, poss, trans = [], [], []
    for w in range(n_windows):
        sl = slice(w * window, (w + 1) * window)
        state, sip, pos, tran_p = step(state, frames[sl],
                                       jnp.asarray(aa[sl]))
        sips.append(sip)
        poss.append(pos)
        if tran_gt is not None:
            trans.append(tran_p)
    # one batched fetch for the whole curve (per-window fetches pay a
    # transport round trip each over tunneled devices)
    sips, poss, trans = jax.device_get((sips, poss, trans))
    out = {"sip_deg": np.asarray(sips), "pos_cm": np.asarray(poss)}
    if tran_gt is not None:
        from mobileposer_tpu.evaluation.pose_eval import translation_drift
        w_sizes = range(1, 8)
        drift = np.full((n_windows, S), np.nan, np.float32)
        per_w = {w: np.full(n_windows, np.nan, np.float32) for w in w_sizes}
        for wi in range(n_windows):
            sl = slice(wi * window, (wi + 1) * window)
            per_w_acc = {w: [] for w in w_sizes}
            for s in range(S):
                d = translation_drift(trans[wi][:, s], tran_gt[sl][:, s],
                                      window_sizes=w_sizes)
                if d:
                    drift[wi, s] = float(np.mean(list(d.values())))
                for w, v in d.items():
                    per_w_acc[w].append(v)
            for w in w_sizes:
                if per_w_acc[w]:
                    per_w[w][wi] = float(np.mean(per_w_acc[w]))
        out["tran_drift_m"] = drift
        out["tran_drift_per_w"] = per_w
    return out
