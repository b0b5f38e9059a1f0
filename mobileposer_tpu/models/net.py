"""MobilePoserNet — the composite pose + translation estimator, TPU-native.

Behavioral parity target: reference `mobileposer/models/net.py:22-219`. The
re-design replaces the reference's stateful nn.Module with pure functions:

  * `forward`           — chained 4-module pass (net.py:101-119)
  * `forward_offline`   — whole-sequence inference incl. translation fusion;
                          the reference's serial Python floor-clamp loop and
                          O(T^2) cumulative sum (net.py:149-154) become one
                          `lax.scan` + `cumsum`
  * `forward_online`    — per-frame streaming as (params, state, frame) ->
                          (outputs, state) with the 45-frame sliding window,
                          velocity LSTM carry, foot anchors and root height
                          all explicit scan-style state (net.py:174-219);
                          vmap over the state batches many streams per chip

Known reference quirks handled deliberately:
  - reference `reset()` (net.py:84-88) never clears the Velocity module's
    LSTM carry; here `init_online_state` resets everything (correct), and
    `forward` takes/returns the carry explicitly so callers can reproduce
    either behavior.
  - reference `forward_online` omits the sigmoid on contact logits when
    computing the fusion weight (net.py:196 vs net.py:143 offline); we apply
    sigmoid in both paths for consistency.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics.smpl import SMPL_PARENTS, ParametricModel
from mobileposer_tpu.models.modules import MODULE_CONFIGS, module_apply
from mobileposer_tpu.nn.lstm import rnn_zero_state

GRAVITY_VELOCITY = np.array([0.0, C.joint_set.gravity_velocity, 0.0])
PROB_THRESHOLD = (0.5, 0.9)           # reference: net.py:53
VEL_SCALE_PER_FRAME = C.datasets.fps / C.amass.vel_scale   # 15
NUM_PAST = C.model_config.past_frames       # 40
NUM_TOTAL = C.model_config.total_frames     # 45

_REDUCED = np.asarray(C.joint_set.reduced)
_IGNORED = np.asarray(C.joint_set.ignored)


def prob_to_weight(p: jnp.ndarray) -> jnp.ndarray:
    """Map contact probability to fusion weight in [0, 1] (net.py:90-91)."""
    lo, hi = PROB_THRESHOLD
    return (jnp.clip(p, lo, hi) - lo) / (hi - lo)


# joint j -> slot in [reduced_rot | identity]: position in the reduced list,
# or the appended identity slot for non-reduced joints
_GATHER_MAP = np.full(24, len(C.joint_set.reduced), np.int32)
for _pos, _j in enumerate(C.joint_set.reduced):
    _GATHER_MAP[_j] = _pos

# joint j -> reduced-list position of its NEAREST REDUCED ANCESTOR (itself if
# reduced). This is each joint's *effective* global rotation after the
# IK -> identity-at-ignored -> FK round trip the model performs: a
# non-reduced joint inherits its reduced ancestor's global rotation (e.g.
# foot 10 rotates with knee 4, not with identity).
_EFFECTIVE_GATHER_MAP = np.zeros(24, np.int32)
for _j in range(24):
    _a = _j
    while _a not in C.joint_set.reduced:
        _a = SMPL_PARENTS[_a]
    _EFFECTIVE_GATHER_MAP[_j] = list(C.joint_set.reduced).index(_a)
_IGNORED_MASK = np.zeros((24, 1, 1), np.float32)
_IGNORED_MASK[list(C.joint_set.ignored)] = 1.0
_ROOT_MASK = np.zeros((24, 1, 1), np.float32)
_ROOT_MASK[0] = 1.0


def reduced_r6d_to_global(reduced_r6d: jnp.ndarray,
                          effective: bool = False) -> jnp.ndarray:
    """16-joint r6d -> full 24-joint GLOBAL rotations. Gather-assembled.

    effective=False: identity at non-reduced joints (the raw assembly fed
    into IK, matching reduced_pose_to_full semantics).
    effective=True: each non-reduced joint inherits its nearest reduced
    ancestor's rotation — the joint's actual global rotation after the
    IK -> identity-at-ignored -> FK round trip; use this for position-only
    FK so feet/hands move with knees/wrists like the full model does.
    """
    n = reduced_r6d.shape[0]
    reduced_rot = R.r6d_to_rotation_matrix(reduced_r6d).reshape(n, -1, 3, 3)
    if effective:
        return jnp.take(reduced_rot, _EFFECTIVE_GATHER_MAP, axis=1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=reduced_rot.dtype), (n, 1, 3, 3))
    padded = jnp.concatenate([reduced_rot, eye], axis=1)     # [n, 17, 3, 3]
    return jnp.take(padded, _GATHER_MAP, axis=1)             # [n, 24, 3, 3]


def reduced_global_to_full(reduced_r6d: jnp.ndarray,
                           body_model: ParametricModel) -> jnp.ndarray:
    """16-joint global r6d -> full 24-joint local rotations (net.py:93-99).

    r6d -> global rotmats at the reduced joints (identity elsewhere) -> IK to
    local -> identity at ignored joints -> root keeps its *global* rotation.
    Assembled with gathers + masked selects (no scatters — scatters of
    [N, 24, 3, 3] were ~1.3 ms per 11k frames on v5e; this path fuses).
    """
    global_pose = reduced_r6d_to_global(reduced_r6d)
    local_pose = body_model.inverse_kinematics_R(global_pose)
    eye24 = jnp.eye(3, dtype=local_pose.dtype)
    local_pose = jnp.where(_IGNORED_MASK > 0, eye24, local_pose)
    return jnp.where(_ROOT_MASK > 0, global_pose[:, 0:1], local_pose)


def _soa_parent_map(body_model: ParametricModel) -> np.ndarray:
    """Root-clamped parent indices, cached on the body (numpy constant —
    it constant-folds under jit, same pattern as _GATHER_MAP)."""
    if not hasattr(body_model, "_soa_parent_np"):
        body_model._soa_parent_np = np.array(
            [0 if p < 0 else p for p in body_model.parent], np.int32)
    return body_model._soa_parent_np


def _r6d_to_rot_soa(x: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt r6d -> rotation (reference angular.py:167-182) in the
    lane-major layout: x [J, 6, N] -> [J, 3, 3, N]. The norm clamp matches
    kinematics.rotation._safe_norm exactly."""
    eps_sq = 1e-8 * 1e-8
    v1, v2 = x[:, 0:3], x[:, 3:6]                                # [J, 3, N]
    col0 = v1 / jnp.sqrt(jnp.maximum(
        jnp.sum(v1 * v1, axis=1, keepdims=True), eps_sq))
    v2 = v2 - jnp.sum(col0 * v2, axis=1, keepdims=True) * col0
    col1 = v2 / jnp.sqrt(jnp.maximum(
        jnp.sum(v2 * v2, axis=1, keepdims=True), eps_sq))
    col2 = jnp.cross(col0, col1, axis=1)
    return jnp.stack([col0, col1, col2], axis=2)                 # [J,3,3,N]


def reduced_global_to_full_soa(reduced_r6d: jnp.ndarray,
                               body_model: ParametricModel) -> jnp.ndarray:
    """`reduced_global_to_full` in a structure-of-arrays layout: identical
    math and outputs (pinned at 1e-6 by tests/test_net.py), ~5x faster per
    frame in the streaming scan.

    The default layout puts the 3x3 rotation in the minor axes of
    [N, 24, 3, 3]; on TPU every length-3 row then occupies a full
    (sublane, 128-lane) register row, so the r6d Gram-Schmidt, the
    gather-assembly, and the parent^T @ child products all run ~97% padded
    — measured 74 us per frame at S=256 (36% of the whole carry-mode
    step). Here every array is [..., N] with the batch in the lane axis:
    all the small-matrix math becomes perfectly-tiled elementwise VPU ops
    and the only layout changes are one transpose in and one out.
    """
    N = reduced_r6d.shape[0]
    dtype = reduced_r6d.dtype
    x = jnp.transpose(reduced_r6d.reshape(N, -1, 6), (1, 2, 0))  # [16, 6, N]
    rot = _r6d_to_rot_soa(x)                                     # [16,3,3,N]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None, :, :, None],
                           (1, 3, 3, N))
    padded = jnp.concatenate([rot, eye], axis=0)                 # [17,3,3,N]
    glob = jnp.take(padded, _GATHER_MAP, axis=0)                 # [24,3,3,N]

    # IK: local[j] = glob[parent[j]]^T @ glob[j] — three lane-wide FMAs.
    # Products accumulate in f32 to match the f32_matmuls precision of the
    # matmul-based path even under bf16 streaming.
    par_rot = jnp.take(glob, _soa_parent_map(body_model), axis=0)
    par32, glob32 = (par_rot.astype(jnp.float32), glob.astype(jnp.float32))
    local = sum(par32[:, k, :, None] * glob32[:, k, None, :]
                for k in range(3)).astype(dtype)

    eye_m = jnp.eye(3, dtype=dtype)[None, :, :, None]
    local = jnp.where(_IGNORED_MASK[..., None] > 0, eye_m, local)
    local = jnp.where(_ROOT_MASK[..., None] > 0, glob[0:1], local)
    return jnp.transpose(local, (3, 0, 1, 2))                    # [N,24,3,3]


def _position_basis(body_model: ParametricModel):
    """Precompute the linear map from the 16 reduced GLOBAL rotations to
    the 24 joint positions, cached on the body.

    Every joint position is a sum of rotated bone vectors up its ancestor
    chain, and after the effective gather only the 16 reduced rotations
    appear — so p[j, a] = sum_{r,b} W[(j,a),(r,a,b)] * R[r,a,b] + bone[0]
    with W[(j,a),(r,a,b)] = sum of bone[i, b] over path joints i whose
    rotating parent maps to reduced slot r. Returns (W [72, 144],
    root_offset [3]).
    """
    if not hasattr(body_model, "_pos_basis_np"):
        j0 = np.asarray(body_model._J, np.float32)
        j0 = j0 - j0[:1]
        parent = [0 if p < 0 else p for p in body_model.parent]
        bone = j0 - j0[parent]
        bone[0] = j0[0]
        V = np.zeros((24, len(_REDUCED), 3), np.float32)
        for j in range(24):
            i = j
            while i != 0:
                V[j, _EFFECTIVE_GATHER_MAP[parent[i]]] += bone[i]
                i = parent[i]
        W = np.zeros((24, 3, len(_REDUCED), 3, 3), np.float32)
        for a in range(3):
            W[:, a, :, a, :] = V
        body_model._pos_basis_np = (W.reshape(72, len(_REDUCED) * 9),
                                    bone[0].copy())
    return body_model._pos_basis_np


def joint_positions_from_r6d_soa(reduced_r6d: jnp.ndarray,
                                 body_model: ParametricModel) -> jnp.ndarray:
    """Joint positions [N, 72] straight from reduced r6d [N, 96] — the
    whole effective-gather + rotate-bones + tree-prefix-add pipeline
    collapsed into one [72, 144] @ [144, N] matmul over a precomputed
    bone basis (_position_basis), with the batch in the lane axis.

    Matches reduced_r6d_to_global(effective=True) followed by
    joint_positions_from_global at ~1e-6 (pinned by tests/test_net.py).
    This is the training position loss's hot path (reference poser.py:95):
    the AoS formulation cost 3.8 ms of a 24.4 ms poser train step at
    B=256, T=125 on v5e-1.
    """
    N = reduced_r6d.shape[0]
    x = jnp.transpose(reduced_r6d.reshape(N, -1, 6), (1, 2, 0))  # [16, 6, N]
    rot = _r6d_to_rot_soa(x)                                     # [16,3,3,N]
    W, root_off = _position_basis(body_model)
    with jax.default_matmul_precision("float32"):
        pos = W @ rot.reshape(-1, N)                             # [72, N]
    pos = pos + jnp.tile(jnp.asarray(root_off, pos.dtype), 24)[:, None]
    return jnp.transpose(pos, (1, 0))                            # [N, 72]


def forward(params: dict, imu: jnp.ndarray, body_model: ParametricModel,
            lengths: Optional[jnp.ndarray] = None,
            vel_h0c0=None, backend: str = "auto",
            pose_index: Optional[int] = None):
    """Chained 4-module pass (reference: net.py:101-119).

    imu: [B, T, 60]. Returns (pose_local [B, T, 24, 3, 3],
    joints [B, T, 72], vel [B, T, 72], contact_logits [B, T, 2], vel_hc).
    The velocity module's LSTM carry is explicit: pass `vel_h0c0=None` for a
    fresh stream, or thread the returned carry for streaming.
    backend='auto' routes the bidirectional layers through the fused pallas
    kernel on TPU (ops/lstm_pallas.py).

    pose_index: when set, the r6d -> IK -> local-pose assembly runs only at
    that time index and pose_local has shape [B, 24, 3, 3]. The streaming
    path emits a single frame per window (reference net.py:181), and the
    per-frame IK over the full window dominated the streaming step (the
    3x3-matmul tree is VPU-bound, 45x the needed work): measured 12x
    end-to-end on v5e. Per-frame IK is time-independent, so results are
    bit-identical to slicing the full assembly.
    """
    B, T, _ = imu.shape
    # Run the whole chain time-major [T, B, *]: the LSTM core is time-major
    # internally, so chaining modules batch-major costs a transpose
    # round-trip per module (~4 ms per 256x45 window on v5e).
    imu_tm = jnp.swapaxes(imu, 0, 1)
    # 'fused' covers only the trio below; joints takes the 'auto' route so
    # it still gets the fused-bidirectional pallas kernel
    joints_backend = "auto" if backend == "fused" else backend
    pred_joints_tm, _ = module_apply("joints", params["joints"], imu_tm,
                                     lengths, backend=joints_backend,
                                     time_major=True)
    x132 = jnp.concatenate([pred_joints_tm, imu_tm], axis=-1)
    if vel_h0c0 is None:
        vel_h0c0 = rnn_zero_state(MODULE_CONFIGS["velocity"], B, imu.dtype)

    if backend == "fused" and lengths is None:
        # fused trio: poser/footcontact/velocity advance together, one
        # multicell kernel per layer-row. Standalone this measures 2.3x
        # faster than separate scans (B=256, T=45, v5e) — but INSIDE the
        # streaming frame-scan it loses 2x to XLA's pipelined scans (the
        # concatenated projections materialize per frame), so it is opt-in
        # for single-window workloads, not part of backend='auto'.
        from mobileposer_tpu.models.fused import trio_apply
        pred_pose_r6d, contact, vel, vel_hc = trio_apply(
            params, x132, vel_h0c0)
    else:
        backend = joints_backend
        pred_pose_r6d, _ = module_apply("poser", params["poser"], x132,
                                        lengths, backend=backend,
                                        time_major=True)
        contact, _ = module_apply("footcontact", params["footcontact"], x132,
                                  lengths, backend=backend, time_major=True)
        vel, vel_hc = module_apply("velocity", params["velocity"], x132,
                                   lengths, h0c0=vel_h0c0, backend=backend,
                                   time_major=True)
    if pose_index is None:
        pose_local = reduced_global_to_full_soa(
            pred_pose_r6d.reshape(T * B, -1), body_model).reshape(T, B, 24, 3, 3)
        pose_out = jnp.swapaxes(pose_local, 0, 1)
    else:
        # time-major internals: pred_pose_r6d is [T, B, 96]
        pose_out = reduced_global_to_full_soa(pred_pose_r6d[pose_index],
                                              body_model)
    return (pose_out, jnp.swapaxes(pred_joints_tm, 0, 1),
            jnp.swapaxes(vel, 0, 1), jnp.swapaxes(contact, 0, 1), vel_hc)


def _fuse_velocity(joints: jnp.ndarray, vel: jnp.ndarray,
                   contact: jnp.ndarray, floor_y: float):
    """Whole-sequence translation fusion (reference: net.py:129-154).

    joints [T, 24, 3], vel [T, 72], contact logits [T, 2] -> tran [T, 3].
    """
    T = joints.shape[0]
    zero = jnp.zeros((1, 3), joints.dtype)
    lfoot_disp = jnp.concatenate([zero, joints[:-1, 10] - joints[1:, 10]])
    rfoot_disp = jnp.concatenate([zero, joints[:-1, 11] - joints[1:, 11]])
    pick_right = jnp.argmax(contact, axis=1).astype(joints.dtype)[:, None]
    contact_vel = GRAVITY_VELOCITY + R.lerp(lfoot_disp, rfoot_disp, pick_right)

    root_vel = vel.reshape(T, 24, 3)[:, 0] / VEL_SCALE_PER_FRAME
    weight = prob_to_weight(jax.nn.sigmoid(contact.max(axis=1)))[:, None]
    velocity = R.lerp(root_vel, contact_vel, weight)

    # Floor-penetration clamp: the reference's frame-serial Python loop
    # (net.py:149-153) as a scan carrying the accumulated root height.
    foot_min_y = jnp.min(joints[:, 10:12, 1], axis=1)

    def clamp_step(root_y, inp):
        v_y, fy = inp
        current_foot_y = root_y + fy
        v_y = jnp.where(current_foot_y + v_y <= floor_y,
                        floor_y - current_foot_y, v_y)
        return root_y + v_y, v_y

    _, v_y_clamped = jax.lax.scan(clamp_step, 0.0, (velocity[:, 1], foot_min_y))
    velocity = velocity.at[:, 1].set(v_y_clamped)
    return jnp.cumsum(velocity, axis=0)


class MobilePoserNet:
    """Binds parameters + SMPL body constants; all methods are pure in
    (params, inputs) and jit-compatible (reference class: net.py:22)."""

    def __init__(self, body_model: Optional[ParametricModel] = None,
                 online_sigmoid: bool = True):
        self.body_model = body_model or ParametricModel.from_file_or_synthetic(
            C.paths.smpl_file)
        j, _ = self.body_model.get_zero_pose_joint_and_vertex()
        self.j = j                                   # [24, 3] zero-pose joints
        self.feet_pos = j[10:12]                     # net.py:48
        self.floor_y = float(j[10:12, 1].min())      # net.py:49
        # The reference's online path feeds RAW contact logits into the
        # fusion weight while the offline path applies sigmoid first
        # (net.py:196 vs net.py:143). We default to the consistent behavior;
        # online_sigmoid=False reproduces the reference bit-for-bit for
        # checkpoint-parity evaluations.
        self.online_sigmoid = online_sigmoid

    # -- offline -----------------------------------------------------------
    def forward_offline(self, params: dict, imu: jnp.ndarray,
                        vel_h0c0=None, length=None):
        """imu [T, 60] -> (pose [T,24,3,3], joints [T,24,3], tran [T,3],
        contact [T,2]) (reference: net.py:121-171).

        `length` (traced scalar) marks the valid prefix of a padded
        sequence: callers can pad T to a fixed bucket so one compiled
        program serves any sequence length (per-length jit specialization
        costs seconds per compile); outputs beyond `length` are garbage to
        be sliced off. All fusion state flows forward in time, so the valid
        prefix is unaffected by the padding.
        """
        lengths = None if length is None else jnp.asarray([length])
        pose, joints, vel, contact, _ = forward(
            params, imu[None], self.body_model, lengths=lengths,
            vel_h0c0=vel_h0c0)
        T = imu.shape[0]
        joints = joints[0].reshape(T, 24, 3)
        tran = _fuse_velocity(joints, vel[0], contact[0], self.floor_y)
        return pose[0], joints, tran, contact[0]

    # -- streaming ---------------------------------------------------------
    class OnlineState(NamedTuple):
        imu: jnp.ndarray           # [45, 60] sliding window
        initialized: jnp.ndarray   # bool scalar
        vel_h: jnp.ndarray         # [2, 1, 256] velocity LSTM h
        vel_c: jnp.ndarray         # [2, 1, 256] velocity LSTM c
        last_lfoot: jnp.ndarray    # [3]
        last_rfoot: jnp.ndarray    # [3]
        current_root_y: jnp.ndarray
        last_root_pos: jnp.ndarray  # [3]

    # Stream-axis index per field for BATCHED states (stream axis leading
    # everywhere except the [n_layers, S, H] velocity carry). Consumed by
    # parallel.shard_stream_state so fleet sharding never guesses from
    # shapes (a max_streams that collides with n_layers/window length
    # would defeat the slot spreading).
    OnlineState.STREAM_AXES = OnlineState(
        imu=0, initialized=0, vel_h=1, vel_c=1, last_lfoot=0,
        last_rfoot=0, current_root_y=0, last_root_pos=0)

    def init_online_state(self, dtype=jnp.float32) -> "MobilePoserNet.OnlineState":
        """Fresh streaming state (reference: net.py:58-64 + reset, net.py:84).

        Fusion accumulators/anchors stay float32 under bf16 streaming —
        see init_online_state_batched."""
        h, c = rnn_zero_state(MODULE_CONFIGS["velocity"], 1, dtype)
        return MobilePoserNet.OnlineState(
            imu=jnp.zeros((NUM_TOTAL, C.model_config.n_imu), dtype),
            initialized=jnp.asarray(False),
            vel_h=h, vel_c=c,
            last_lfoot=self.feet_pos[0].astype(jnp.float32),
            last_rfoot=self.feet_pos[1].astype(jnp.float32),
            current_root_y=jnp.asarray(0.0, jnp.float32),
            last_root_pos=jnp.zeros(3, jnp.float32))

    def forward_online(self, params: dict, state: "MobilePoserNet.OnlineState",
                       frame: jnp.ndarray):
        """One streaming step (reference: net.py:174-219).

        frame: [60]. Returns ((pose [24,3,3], joints [24,3], root_pos [3],
        contact [2]), new_state). Pure — wrap in jit once, then call per
        frame. Thin S=1 adapter over `forward_online_batched` (one
        implementation of the fusion semantics to maintain).
        """
        bstate = MobilePoserNet.OnlineState(
            imu=state.imu[None],
            initialized=jnp.asarray(state.initialized)[None],
            vel_h=state.vel_h, vel_c=state.vel_c,
            last_lfoot=state.last_lfoot[None],
            last_rfoot=state.last_rfoot[None],
            current_root_y=jnp.asarray(state.current_root_y)[None],
            last_root_pos=state.last_root_pos[None])
        (pose, joints, root, contact), nb = self.forward_online_batched(
            params, bstate, frame[None])
        new_state = MobilePoserNet.OnlineState(
            imu=nb.imu[0], initialized=nb.initialized[0],
            vel_h=nb.vel_h, vel_c=nb.vel_c,
            last_lfoot=nb.last_lfoot[0], last_rfoot=nb.last_rfoot[0],
            current_root_y=nb.current_root_y[0],
            last_root_pos=nb.last_root_pos[0])
        return (pose[0], joints[0], root[0], contact[0]), new_state

    # -- batch-major multi-stream streaming --------------------------------
    def init_online_state_batched(self, n_streams: int, dtype=jnp.float32
                                  ) -> "MobilePoserNet.OnlineState":
        """Streaming state for `n_streams` independent streams, stored
        batch-major: every field gains a leading stream axis except the
        velocity carry, which keeps the LSTM stack layout [2, S, 256].
        Batch-major streaming is ~3x faster than vmapping the per-stream
        step (vmap of a B=1 forward lays matmuls out poorly).

        Built host-side as numpy (eager device ops in setup code cost
        seconds of remote compiles over tunneled transports); the first
        jitted step moves it to the device.

        The fusion accumulators and foot anchors are ALWAYS float32, even
        under `dtype=bfloat16` streaming: root translation integrates a
        per-frame velocity, and at bf16's 8-bit mantissa the increment
        (~5 cm at 30 Hz walking) drops below one ulp once |tran| passes
        ~16 m — the stream's translation would quantize, then freeze. The
        bf16 win (2x VPU rate, half the HBM traffic) comes from the LSTM
        weights/activations; these [S, 3]/[S] buffers cost nothing in f32."""
        S = n_streams
        np_dtype = np.dtype(str(jnp.dtype(dtype)))
        cfg = MODULE_CONFIGS["velocity"]
        n_stack = cfg.n_layers
        feet = np.asarray(self.feet_pos, np.float32)
        return MobilePoserNet.OnlineState(
            imu=np.zeros((S, NUM_TOTAL, C.model_config.n_imu), np_dtype),
            initialized=np.zeros((S,), bool),
            vel_h=np.zeros((n_stack, S, cfg.n_hidden), np_dtype),
            vel_c=np.zeros((n_stack, S, cfg.n_hidden), np_dtype),
            last_lfoot=np.broadcast_to(feet[0], (S, 3)).copy(),
            last_rfoot=np.broadcast_to(feet[1], (S, 3)).copy(),
            current_root_y=np.zeros((S,), np.float32),
            last_root_pos=np.zeros((S, 3), np.float32))

    def _fusion_step(self, joints, contact, vel_emit, last_lfoot, last_rfoot,
                     current_root_y, last_root_pos):
        """One frame of the streaming translation fusion for S streams
        (reference net.py:186-208) — the single implementation shared by
        the scan path and the unfolded path.

        joints [S,24,3], contact [S,2] logits, vel_emit [S,72].
        Returns (velocity [S,3], v_y [S], lfoot [S,3], rfoot [S,3]).
        """
        lfoot, rfoot = joints[:, 10], joints[:, 11]
        contact_vel = jnp.where((contact[:, 0] > contact[:, 1])[:, None],
                                last_lfoot - lfoot,
                                last_rfoot - rfoot) + GRAVITY_VELOCITY
        root_vel = vel_emit.reshape(-1, 24, 3)[:, 0] / VEL_SCALE_PER_FRAME
        cmax = contact.max(axis=1)
        weight = prob_to_weight(
            jax.nn.sigmoid(cmax) if self.online_sigmoid else cmax)[:, None]
        velocity = R.lerp(root_vel, contact_vel, weight)

        current_foot_y = current_root_y + jnp.minimum(lfoot[:, 1],
                                                      rfoot[:, 1])
        v_y = jnp.where(current_foot_y + velocity[:, 1] <= self.floor_y,
                        self.floor_y - current_foot_y, velocity[:, 1])
        velocity = jnp.concatenate(
            [velocity[:, :1], v_y[:, None], velocity[:, 2:]], axis=1)
        # keep the carried state's dtype (f64/np constants promote bf16;
        # and under bf16 streaming the accumulators/anchors stay f32 —
        # see init_online_state_batched)
        velocity = velocity.astype(last_root_pos.dtype)
        v_y = v_y.astype(current_root_y.dtype)
        lfoot = lfoot.astype(last_lfoot.dtype)
        rfoot = rfoot.astype(last_rfoot.dtype)
        return velocity, v_y, lfoot, rfoot

    def forward_online_batched(self, params: dict,
                               state: "MobilePoserNet.OnlineState",
                               frames: jnp.ndarray):
        """One streaming step for S streams at once. frames: [S, 60].

        Identical per-stream semantics to `forward_online`, with the stream
        axis as the forward batch. Returns ((pose [S,24,3,3], joints
        [S,24,3], root [S,3], contact [S,2]), new_state)."""
        S = frames.shape[0]
        slid = jnp.concatenate([state.imu[:, 1:], frames[:, None]], axis=1)
        fresh = jnp.broadcast_to(frames[:, None], (S, NUM_TOTAL, frames.shape[1]))
        window = jnp.where(state.initialized[:, None, None], slid, fresh)

        pose_t, joints_seq, vel, contact_seq, vel_hc = forward(
            params, window, self.body_model,
            vel_h0c0=(state.vel_h, state.vel_c), pose_index=NUM_PAST)

        joints = joints_seq[:, NUM_PAST].reshape(S, 24, 3)
        contact = contact_seq[:, NUM_PAST]

        velocity, v_y, lfoot, rfoot = self._fusion_step(
            joints, contact, vel[:, NUM_PAST], state.last_lfoot,
            state.last_rfoot, state.current_root_y, state.last_root_pos)

        new_state = MobilePoserNet.OnlineState(
            imu=window,
            initialized=jnp.ones((S,), bool),
            vel_h=vel_hc[0], vel_c=vel_hc[1],
            last_lfoot=lfoot, last_rfoot=rfoot,
            current_root_y=state.current_root_y + v_y,
            last_root_pos=state.last_root_pos + velocity)
        return (pose_t, joints, new_state.last_root_pos, contact), new_state

    #: below this many streams the unfolded mode wins (measured on v5e-1,
    #: N=100: S=1 6.6x, S=8 3.6x, S=32 break-even, S>=64 scan wins — the
    #: scan path is compute-bound past ~32 streams at ~57% of bf16 peak,
    #: so extra window-parallelism can't help there)
    UNFOLD_MAX_STREAMS = 32

    def forward_online_sequence_batched(self, params: dict,
                                        state: "MobilePoserNet.OnlineState",
                                        frames: jnp.ndarray,
                                        mode: str = "auto",
                                        chunk: int = 25,
                                        backend: str = "auto"):
        """S streams x N frames in one dispatch. frames: [N, S, 60].

        Both modes compute IDENTICAL outputs (pinned at 2e-5 by
        tests/test_net.py); 'auto' picks by stream count:

        mode='scan' replays the per-frame step N times — the reference's
        own control flow (net.py:174-178). Wins for large stream batches,
        where it is compute-bound (~57% of bf16 peak at S=256).

        mode='unfolded' materializes all N sliding windows and runs the
        three bidirectional modules over them as one big batch: their
        window passes are independent across frames (fresh h0 per
        window), so the only genuinely sequential parts are the velocity
        module's cross-window carry and the tiny fusion scan. Wins when
        the scan path is latency-bound — few streams (6.6x at S=1).

        `chunk` bounds unfolded-mode activation memory: windows are
        processed in blocks of `chunk` frames inside a lax.scan
        ([chunk*S, 45, ...] activations live at once). N is padded up to
        a multiple; padded frames are computed then discarded, with all
        carried state frozen by a validity mask so the final state equals
        frame N's exactly.

        For throughput beyond what exact semantics allow, see the opt-in
        carry mode (`forward_carry_sequence_batched`, ~4.5x at S=256).
        """
        if mode == "auto":
            mode = ("unfolded" if frames.shape[1] < self.UNFOLD_MAX_STREAMS
                    else "scan")
        if mode == "scan":
            def step(st, frame):
                outputs, st = self.forward_online_batched(params, st, frame)
                return st, outputs

            state, (pose, joints, root, contact) = jax.lax.scan(
                step, state, frames)
            return (pose, joints, root, contact), state
        if mode != "unfolded":
            raise ValueError(f"unknown streaming mode {mode!r}")
        return self._forward_online_sequence_unfolded(
            params, state, frames, chunk, backend)

    def _forward_online_sequence_unfolded(self, params: dict,
                                          state: "MobilePoserNet.OnlineState",
                                          frames: jnp.ndarray, chunk: int,
                                          backend: str = "auto"):
        S = frames.shape[1]
        N = frames.shape[0]
        D = frames.shape[2]
        W, E = NUM_TOTAL, NUM_PAST
        K = min(chunk, N)
        C = -(-N // K)
        n_pad = C * K
        if n_pad > N:
            frames = jnp.concatenate(
                [frames, jnp.broadcast_to(frames[-1], (n_pad - N, S, D))])
        valid = (np.arange(n_pad) < N)

        # stream-major frame history: 44 frames of context before frame 0
        # (the previous window's tail, or frame 0 repeated for a fresh
        # stream — reference net.py:175), then the N frames.
        frames_sm = jnp.swapaxes(frames, 0, 1)              # [S, n_pad, D]
        prefix = jnp.where(state.initialized[:, None, None],
                           state.imu[:, 1:],
                           jnp.broadcast_to(frames_sm[:, :1], (S, W - 1, D)))
        full = jnp.concatenate([prefix, frames_sm], axis=1)  # [S, 44+n_pad, D]

        def chunk_step(carry, xs):
            (vel_h, vel_c, lf, rf, root_y, root_pos) = carry
            c_idx, ok = xs                                   # [], [K]
            seg = jax.lax.dynamic_slice(
                full, (0, c_idx * K, 0), (S, K + W - 1, D))  # [S, K+44, D]
            windows = jnp.stack([seg[:, k:k + W] for k in range(K)])
            # time-major over the window axis, frames*streams as batch
            x_tm = jnp.transpose(windows, (2, 0, 1, 3)).reshape(W, K * S, D)
            joints_tm, _ = module_apply("joints", params["joints"], x_tm,
                                        backend=backend, time_major=True)
            x132_tm = jnp.concatenate([joints_tm, x_tm], axis=-1)
            r6d_tm, _ = module_apply("poser", params["poser"], x132_tm,
                                     backend=backend, time_major=True)
            contact_tm, _ = module_apply("footcontact", params["footcontact"],
                                         x132_tm, backend=backend,
                                         time_major=True)
            pose_e = reduced_global_to_full_soa(
                r6d_tm[E], self.body_model).reshape(K, S, 24, 3, 3)
            joints_e = joints_tm[E].reshape(K, S, 24, 3)
            contact_e = contact_tm[E].reshape(K, S, 2)

            # velocity: the one module whose LSTM carry crosses windows
            # (reference velocity.py:45-48) — sequential over the K windows
            x132_w = x132_tm.reshape(W, K, S, 132)

            def vstep(vc, xs_v):
                h, c = vc
                x_w, ok_w = xs_v                             # [W, S, 132]
                y_tm, (h2, c2) = module_apply(
                    "velocity", params["velocity"], x_w, h0c0=(h, c),
                    backend="auto", time_major=True)
                h = jnp.where(ok_w, h2, h)
                c = jnp.where(ok_w, c2, c)
                return (h, c), y_tm[E]

            (vel_h, vel_c), vel_e = jax.lax.scan(
                vstep, (vel_h, vel_c),
                (jnp.swapaxes(x132_w, 0, 1), ok))            # vel_e [K, S, 72]

            def fstep(fc, xs_f):
                lf, rf, root_y, root_pos = fc
                j_k, c_k, v_k, ok_k = xs_f
                velocity, v_y, lfoot, rfoot = self._fusion_step(
                    j_k, c_k, v_k, lf, rf, root_y, root_pos)
                root_out = root_pos + velocity
                fc = (jnp.where(ok_k, lfoot, lf), jnp.where(ok_k, rfoot, rf),
                      root_y + jnp.where(ok_k, v_y, 0),
                      root_pos + jnp.where(ok_k, velocity, 0))
                return fc, root_out

            (lf, rf, root_y, root_pos), root_e = jax.lax.scan(
                fstep, (lf, rf, root_y, root_pos),
                (joints_e, contact_e, vel_e, ok))

            carry = (vel_h, vel_c, lf, rf, root_y, root_pos)
            return carry, (pose_e, joints_e, root_e, contact_e)

        carry0 = (state.vel_h, state.vel_c, state.last_lfoot,
                  state.last_rfoot, state.current_root_y, state.last_root_pos)
        xs = (jnp.arange(C, dtype=jnp.int32), jnp.asarray(valid).reshape(C, K))
        (vel_h, vel_c, lf, rf, root_y, root_pos), outs = jax.lax.scan(
            chunk_step, carry0, xs)
        pose, joints, root, contact = (
            o.reshape((n_pad,) + o.shape[2:])[:N] for o in outs)

        new_state = MobilePoserNet.OnlineState(
            imu=jax.lax.dynamic_slice(full, (0, N - 1, 0), (S, W, D)),
            initialized=jnp.ones((S,), bool),
            vel_h=vel_h, vel_c=vel_c,
            last_lfoot=lf, last_rfoot=rf,
            current_root_y=root_y, last_root_pos=root_pos)
        return (pose, joints, root, contact), new_state

    # -- carry-mode streaming (opt-in approximation; models/streaming.py) --
    def init_carry_state_batched(self, n_streams: int, dtype=jnp.float32):
        """Fresh state for carry-mode streaming: forward LSTM states carried
        across frames (never window-reset), backward directions recomputed
        over the 5-frame lookahead tail only. ~15x fewer FLOPs per frame
        than the exact windowed semantics; numerically different outputs —
        see models/streaming.py for the full contract."""
        from mobileposer_tpu.models.streaming import init_carry_state_batched
        return init_carry_state_batched(self, n_streams, dtype)

    def forward_carry_batched(self, params: dict, state, frames: jnp.ndarray):
        """One carry-mode step for S streams. frames [S, 60]."""
        from mobileposer_tpu.models.streaming import forward_carry_batched
        return forward_carry_batched(self, params, state, frames)

    def forward_carry_sequence_batched(self, params: dict, state,
                                       frames: jnp.ndarray):
        """Carry-mode streaming over [N, S, 60] frames in one dispatch."""
        from mobileposer_tpu.models.streaming import (
            forward_carry_sequence_batched)
        return forward_carry_sequence_batched(self, params, state, frames)

    def forward_online_sequence(self, params: dict,
                                state: "MobilePoserNet.OnlineState",
                                frames: jnp.ndarray):
        """Streaming over a whole frame sequence in ONE dispatch.

        frames: [N, 60]. Semantically identical to N successive
        `forward_online` calls (same sliding windows, same carried state),
        but the frame loop is a `lax.scan` inside one jit region — this is
        what makes the ONLINE evaluation protocol (evaluate.py:62-64)
        fast on TPU: one compile, no per-frame host round-trips.

        Returns ((pose [N,24,3,3], joints [N,24,3], root [N,3],
        contact [N,2]), final_state).
        """
        def step(st, frame):
            outputs, st = self.forward_online(params, st, frame)
            return st, outputs

        state, (pose, joints, root, contact) = jax.lax.scan(
            step, state, frames)
        return (pose, joints, root, contact), state
