"""Carry-mode streaming: O(lookahead) work per frame instead of O(window).

The reference streaming path re-runs the whole 45-frame window through all
four modules for every emitted frame (reference net.py:174-178) because
the biLSTMs reset their state at each window start. That is ~600 MFLOP and
~360 sequential LSTM steps per frame. This module implements a documented
APPROXIMATION of those semantics (opt-in; the exact path stays the
default) that needs ~40 MFLOP and ~50 sequential steps per frame:

  * FORWARD LSTM directions carry their state across the stream and are
    never reset — each new frame costs ONE forward step per layer. (The
    reference truncates forward context to 40 frames by resetting per
    window; carrying gives the model more context, and matches how the
    unidirectional Velocity module already behaves.)
  * BACKWARD directions only ever influence the emitted frame through the
    window TAIL: the reference emits index 40 of 45, so its backward state
    at the emit position has consumed exactly the last 5 frames from a
    zero init. Carry mode recomputes exactly that 5-step tail per frame —
    this half is NOT an approximation.
  * Where a layer/module consumes another's output (layer 2 consumes
    layer 1; poser/footcontact consume joints), the tail positions beyond
    the emit index use PROVISIONAL values (computed with the lookahead
    available so far, revised as frames arrive); committed forward carries
    only ever consume the fully-looked-ahead emit position, except the
    bwd-derived features which are inherently tail-dependent.
  * Velocity consumes each frame ONCE with a continuously carried state —
    which is how it is trained (whole windows, state threaded), unlike the
    reference's online path, which re-feeds every frame up to 45 times
    into the same carried state (reference velocity.py:45-48 called per
    window, net.py:117).

Emission timing matches the reference: the output at step t corresponds to
input frame t-4 (same 4-frame lookahead lag); warm-up fills rings with the
first frame, mirroring the reference's repeat-first-frame window.

Accuracy note: outputs are numerically different from the windowed path
(forward context differs). Measured on a TRAINED checkpoint (the
convergence-demo weights, scripts/carry_ab.py on v5e-1; recorded in
benchmarks/report_v5e1.json "carry_accuracy_ab"): ONLINE-protocol deltas
vs exact are SIP +0.52 deg (21.43 -> 21.95), positional +0.34 cm
(10.84 -> 11.18), and jitter IMPROVES by 15% (0.437 -> 0.373) because the
carried forward state never resets. Bounded by CI on the committed
trained fixture (tests/test_carry_accuracy.py). Real-dataset validation
still belongs to parity day (docs/parity.md). The fusion math on top of
the emitted module outputs is bit-identical (MobilePoserNet._fusion_step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.models.modules import MODULE_CONFIGS
from mobileposer_tpu.models.net import NUM_PAST, NUM_TOTAL
from mobileposer_tpu.nn.lstm import lstm_cell_step as lstm_step

LOOKAHEAD = NUM_TOTAL - NUM_PAST          # 5 tail positions (emit + 4 future)


def _bwd_tail(p: dict, x_tail: jnp.ndarray) -> jnp.ndarray:
    """Backward direction over the L-frame tail from a zero init — exactly
    the backward state the windowed path has at the emit position.
    x_tail [L, S, D] -> outputs [L, S, H]."""
    L, S = x_tail.shape[:2]
    H = p["w_hh"].shape[0]
    h = c = jnp.zeros((S, H), x_tail.dtype)
    outs = [None] * L
    for i in reversed(range(L)):
        h, c = lstm_step(p, x_tail[i], h, c)
        outs[i] = h
    return jnp.stack(outs)


def _fwd_prov(p: dict, x_rest: jnp.ndarray, h, c) -> jnp.ndarray:
    """Provisional forward steps over the tail positions after the emit
    (x_rest [L-1, S, D]); the committed carry is NOT advanced."""
    outs = []
    for i in range(x_rest.shape[0]):
        h, c = lstm_step(p, x_rest[i], h, c)
        outs.append(h)
    return jnp.stack(outs)


class BiCarry(NamedTuple):
    """Forward-direction carries of one 2-layer biLSTM block."""
    f1_h: jnp.ndarray
    f1_c: jnp.ndarray
    f2_h: jnp.ndarray
    f2_c: jnp.ndarray


class JointsCarry(NamedTuple):
    """Joints block: raw inputs are final on arrival, so layer-1 forward
    commits on the newest frame and rings hold the committed tail."""
    x1_ring: jnp.ndarray      # [L, S, H] relu(linear1(imu)) tail
    f1_ring: jnp.ndarray      # [L, S, H] committed fwd-1 outputs tail
    f1_h: jnp.ndarray
    f1_c: jnp.ndarray
    f2_h: jnp.ndarray
    f2_c: jnp.ndarray


def _zeros(S, H, dtype):
    return jnp.zeros((S, H), dtype)


def joints_carry_init(S: int, dtype=jnp.float32) -> JointsCarry:
    H = MODULE_CONFIGS["joints"].n_hidden
    z = _zeros(S, H, dtype)
    ring = jnp.zeros((LOOKAHEAD, S, H), dtype)
    return JointsCarry(ring, ring, z, z, z, z)


def bi_carry_init(name: str, S: int, dtype=jnp.float32) -> BiCarry:
    H = MODULE_CONFIGS[name].n_hidden
    z = _zeros(S, H, dtype)
    return BiCarry(z, z, z, z)


def joints_carry_step(params: dict, st: JointsCarry, imu_t: jnp.ndarray,
                      initialized: jnp.ndarray):
    """One frame through the joints block. imu_t [S, 60].

    Returns (joints_tail [L, S, 72] — emit first, then provisional
    lookahead positions — and the new carry)."""
    l1, l2 = params["lstm"]
    x1_t = jax.nn.relu(imu_t @ params["linear1"]["w"] + params["linear1"]["b"])
    ini = initialized[:, None]

    # warm-up: rings behave as if the stream had always been at frame 0
    x1_ring = jnp.where(ini,
                        jnp.concatenate([st.x1_ring[1:], x1_t[None]]),
                        jnp.broadcast_to(x1_t, st.x1_ring.shape))
    h1, c1 = lstm_step(l1["fwd"], x1_t, jnp.where(ini, st.f1_h, 0.0),
                       jnp.where(ini, st.f1_c, 0.0))
    f1_ring = jnp.where(ini,
                        jnp.concatenate([st.f1_ring[1:], h1[None]]),
                        jnp.broadcast_to(h1, st.f1_ring.shape))

    b1_tail = _bwd_tail(l1["bwd"], x1_ring)
    x2_tail = jnp.concatenate([f1_ring, b1_tail], axis=-1)   # [L, S, 2H]

    h2, c2 = lstm_step(l2["fwd"], x2_tail[0],
                       jnp.where(ini, st.f2_h, 0.0),
                       jnp.where(ini, st.f2_c, 0.0))
    f2_tail = jnp.concatenate([h2[None], _fwd_prov(l2["fwd"], x2_tail[1:],
                                                   h2, c2)])
    b2_tail = _bwd_tail(l2["bwd"], x2_tail)
    y_tail = (jnp.concatenate([f2_tail, b2_tail], axis=-1)
              @ params["linear2"]["w"] + params["linear2"]["b"])
    return y_tail, JointsCarry(x1_ring, f1_ring, h1, c1, h2, c2)


def bi_carry_step(params: dict, st: BiCarry, x_tail: jnp.ndarray,
                  initialized: jnp.ndarray):
    """One frame through a downstream biLSTM block (poser / footcontact)
    whose inputs at tail positions after the emit are provisional.
    x_tail [L, S, D] (emit position first). Returns (y_emit [S, out],
    new carry)."""
    l1, l2 = params["lstm"]
    ini = initialized[:, None]
    x1_tail = jax.nn.relu(x_tail @ params["linear1"]["w"]
                          + params["linear1"]["b"])

    h1, c1 = lstm_step(l1["fwd"], x1_tail[0],
                       jnp.where(ini, st.f1_h, 0.0),
                       jnp.where(ini, st.f1_c, 0.0))
    f1_tail = jnp.concatenate([h1[None], _fwd_prov(l1["fwd"], x1_tail[1:],
                                                   h1, c1)])
    b1_tail = _bwd_tail(l1["bwd"], x1_tail)
    x2_tail = jnp.concatenate([f1_tail, b1_tail], axis=-1)

    h2, c2 = lstm_step(l2["fwd"], x2_tail[0],
                       jnp.where(ini, st.f2_h, 0.0),
                       jnp.where(ini, st.f2_c, 0.0))
    b2 = _bwd_tail(l2["bwd"], x2_tail)[0]
    y_emit = (jnp.concatenate([h2, b2], axis=-1)
              @ params["linear2"]["w"] + params["linear2"]["b"])
    return y_emit, BiCarry(h1, c1, h2, c2)


def velocity_carry_step(params: dict, h: jnp.ndarray, c: jnp.ndarray,
                        x_emit: jnp.ndarray, initialized: jnp.ndarray):
    """Velocity block: unidirectional, consumes the emit-position input
    once per frame with a continuously carried state (the training-time
    data flow). x_emit [S, 132], h/c [2, S, H]."""
    l1, l2 = params["lstm"]
    ini = initialized[:, None]
    xv = jax.nn.relu(x_emit @ params["linear1"]["w"] + params["linear1"]["b"])
    h1, c1 = lstm_step(l1["fwd"], xv, jnp.where(ini, h[0], 0.0),
                       jnp.where(ini, c[0], 0.0))
    h2, c2 = lstm_step(l2["fwd"], h1, jnp.where(ini, h[1], 0.0),
                       jnp.where(ini, c[1], 0.0))
    y = h2 @ params["linear2"]["w"] + params["linear2"]["b"]
    return y, jnp.stack([h1, h2]), jnp.stack([c1, c2])


class CarryState(NamedTuple):
    """Full streaming state for S carry-mode streams."""
    imu_ring: jnp.ndarray      # [L, S, 60] raw frame tail (emit first)
    initialized: jnp.ndarray   # [S] bool
    joints: JointsCarry
    poser: BiCarry
    footcontact: BiCarry
    vel_h: jnp.ndarray         # [2, S, 256]
    vel_c: jnp.ndarray
    last_lfoot: jnp.ndarray    # [S, 3]
    last_rfoot: jnp.ndarray
    current_root_y: jnp.ndarray  # [S]
    last_root_pos: jnp.ndarray   # [S, 3]


# Stream-axis index per field (rings and stacked LSTM carries keep the
# stream axis second; everything else leads with it). Consumed by
# parallel.shard_stream_state — see MobilePoserNet.OnlineState.STREAM_AXES.
CarryState.STREAM_AXES = CarryState(
    imu_ring=1, initialized=0,
    joints=JointsCarry(x1_ring=1, f1_ring=1, f1_h=0, f1_c=0,
                       f2_h=0, f2_c=0),
    poser=BiCarry(f1_h=0, f1_c=0, f2_h=0, f2_c=0),
    footcontact=BiCarry(f1_h=0, f1_c=0, f2_h=0, f2_c=0),
    vel_h=1, vel_c=1, last_lfoot=0, last_rfoot=0,
    current_root_y=0, last_root_pos=0)


def init_carry_state_batched(net, n_streams: int, dtype=jnp.float32
                             ) -> CarryState:
    """Host-built fresh state (numpy; eager device ops in setup code cost
    remote compiles over tunneled transports — see CLAUDE.md).

    The fusion accumulators/anchors (feet, root height, root position) are
    ALWAYS float32, even for bf16 streaming: translation integrates a
    per-frame velocity whose magnitude drops below one bf16 ulp once the
    accumulated position passes ~16 m, after which a bf16 accumulator
    quantizes and freezes (see MobilePoserNet.init_online_state_batched)."""
    S = n_streams
    np_dtype = np.dtype(str(jnp.dtype(dtype)))
    Hv = MODULE_CONFIGS["velocity"].n_hidden
    Hj = MODULE_CONFIGS["joints"].n_hidden
    Hp = MODULE_CONFIGS["poser"].n_hidden
    Hf = MODULE_CONFIGS["footcontact"].n_hidden
    feet = np.asarray(net.feet_pos, np.float32)

    def z(*shape):
        return np.zeros(shape, np_dtype)

    return CarryState(
        imu_ring=z(LOOKAHEAD, S, C.model_config.n_imu),
        initialized=np.zeros((S,), bool),
        joints=JointsCarry(z(LOOKAHEAD, S, Hj), z(LOOKAHEAD, S, Hj),
                           z(S, Hj), z(S, Hj), z(S, Hj), z(S, Hj)),
        poser=BiCarry(z(S, Hp), z(S, Hp), z(S, Hp), z(S, Hp)),
        footcontact=BiCarry(z(S, Hf), z(S, Hf), z(S, Hf), z(S, Hf)),
        vel_h=z(2, S, Hv), vel_c=z(2, S, Hv),
        last_lfoot=np.broadcast_to(feet[0], (S, 3)).copy(),
        last_rfoot=np.broadcast_to(feet[1], (S, 3)).copy(),
        current_root_y=np.zeros((S,), np.float32),
        last_root_pos=np.zeros((S, 3), np.float32))


def forward_carry_batched(net, params: dict, state: CarryState,
                          frames: jnp.ndarray):
    """One carry-mode step for S streams. frames [S, 60]. Returns
    ((pose [S,24,3,3], joints [S,24,3], root [S,3], contact [S,2]),
    new_state); outputs correspond to input frame t-4 like the windowed
    path."""
    from mobileposer_tpu.models.net import reduced_global_to_full_soa
    S = frames.shape[0]
    ini = state.initialized[:, None]
    imu_ring = jnp.where(ini,
                         jnp.concatenate([state.imu_ring[1:], frames[None]]),
                         jnp.broadcast_to(frames, state.imu_ring.shape))

    joints_tail, jc = joints_carry_step(params["joints"], state.joints,
                                        frames, state.initialized)
    x132_tail = jnp.concatenate([joints_tail, imu_ring], axis=-1)

    r6d_emit, pc = bi_carry_step(params["poser"], state.poser, x132_tail,
                                 state.initialized)
    contact, fc = bi_carry_step(params["footcontact"], state.footcontact,
                                x132_tail, state.initialized)
    vel_emit, vel_h, vel_c = velocity_carry_step(
        params["velocity"], state.vel_h, state.vel_c, x132_tail[0],
        state.initialized)

    pose = reduced_global_to_full_soa(r6d_emit, net.body_model)
    joints = joints_tail[0].reshape(S, 24, 3)

    velocity, v_y, lfoot, rfoot = net._fusion_step(
        joints, contact, vel_emit, state.last_lfoot, state.last_rfoot,
        state.current_root_y, state.last_root_pos)

    new_state = CarryState(
        imu_ring=imu_ring,
        initialized=jnp.ones((S,), bool),
        joints=jc, poser=pc, footcontact=fc,
        vel_h=vel_h, vel_c=vel_c,
        last_lfoot=lfoot, last_rfoot=rfoot,
        current_root_y=state.current_root_y + v_y,
        last_root_pos=state.last_root_pos + velocity)
    return (pose, joints, new_state.last_root_pos, contact), new_state


def forward_carry_sequence_batched(net, params: dict, state: CarryState,
                                   frames: jnp.ndarray):
    """S streams x N frames in one dispatch. frames [N, S, 60]."""
    def step(st, frame):
        outputs, st = forward_carry_batched(net, params, st, frame)
        return st, outputs

    state, (pose, joints, root, contact) = jax.lax.scan(step, state, frames)
    return (pose, joints, root, contact), state
