"""Carry-mode streaming (models/streaming.py): wiring pinned against an
independent literal replica, plus behavioral-contract tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MODULE_CONFIGS, MobilePoserNet, init_all_modules
from mobileposer_tpu.models.streaming import LOOKAHEAD


@pytest.fixture(scope="module")
def net():
    return MobilePoserNet(ParametricModel.synthetic(num_vertices=240))


@pytest.fixture(scope="module")
def params():
    return init_all_modules(jax.random.PRNGKey(0))


# --- literal numpy replica of the documented carry semantics --------------

def np_lstm_step(p, x, h, c):
    gates = x @ np.asarray(p["w_ih"]) + np.asarray(p["b_ih"]) \
        + np.asarray(p["b_hh"]) + h @ np.asarray(p["w_hh"])
    i, f, g, o = np.split(gates, 4, axis=-1)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    c2 = sig(f) * c + sig(i) * np.tanh(g)
    return sig(o) * np.tanh(c2), c2


def np_bwd_tail(p, x_tail):
    L, S = x_tail.shape[:2]
    H = np.asarray(p["w_hh"]).shape[0]
    h = c = np.zeros((S, H), np.float32)
    outs = [None] * L
    for i in reversed(range(L)):
        h, c = np_lstm_step(p, x_tail[i], h, c)
        outs[i] = h
    return np.stack(outs)


def np_relu_lin(p, x):
    return np.maximum(x @ np.asarray(p["w"]) + np.asarray(p["b"]), 0.0)


class NpJoints:
    """Literal replica of joints_carry_step (independent implementation)."""

    def __init__(self, params, S):
        H = MODULE_CONFIGS["joints"].n_hidden
        self.p = params
        self.x1_ring = np.zeros((LOOKAHEAD, S, H), np.float32)
        self.f1_ring = np.zeros((LOOKAHEAD, S, H), np.float32)
        self.h1 = self.c1 = self.h2 = self.c2 = np.zeros((S, H), np.float32)
        self.first = True

    def step(self, imu_t):
        l1, l2 = self.p["lstm"]
        x1 = np_relu_lin(self.p["linear1"], imu_t)
        if self.first:
            self.x1_ring[:] = x1
        else:
            self.x1_ring = np.concatenate([self.x1_ring[1:], x1[None]])
        self.h1, self.c1 = np_lstm_step(l1["fwd"], x1, self.h1, self.c1)
        if self.first:
            self.f1_ring[:] = self.h1
        else:
            self.f1_ring = np.concatenate([self.f1_ring[1:], self.h1[None]])
        b1 = np_bwd_tail(l1["bwd"], self.x1_ring)
        x2 = np.concatenate([self.f1_ring, b1], axis=-1)
        self.h2, self.c2 = np_lstm_step(l2["fwd"], x2[0], self.h2, self.c2)
        f2 = [self.h2]
        h, c = self.h2, self.c2
        for i in range(1, LOOKAHEAD):
            h, c = np_lstm_step(l2["fwd"], x2[i], h, c)
            f2.append(h)
        b2 = np_bwd_tail(l2["bwd"], x2)
        y = np.concatenate([np.stack(f2), b2], axis=-1)
        y = y @ np.asarray(self.p["linear2"]["w"]) + np.asarray(
            self.p["linear2"]["b"])
        self.first = False
        return y


def test_joints_carry_matches_literal_replica(params):
    from mobileposer_tpu.models.streaming import (joints_carry_init,
                                                  joints_carry_step)
    S, N = 2, 8
    rng = np.random.RandomState(3)
    frames = rng.randn(N, S, 60).astype(np.float32) * 0.1

    replica = NpJoints(params["joints"], S)
    st = joints_carry_init(S)
    initialized = jnp.zeros((S,), bool)
    step = jax.jit(joints_carry_step)
    for t in range(N):
        want = replica.step(frames[t])
        got, st = step(params["joints"], st, jnp.asarray(frames[t]),
                       initialized)
        initialized = jnp.ones((S,), bool)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   err_msg=f"frame {t}")


def test_backward_tail_is_exact_vs_windowed(params):
    """The backward half of carry mode is NOT an approximation: feeding a
    full biLSTM the last-5 window must give the same backward-direction
    output at the emit position as carry mode's tail recompute."""
    from mobileposer_tpu.models.streaming import _bwd_tail
    from mobileposer_tpu.nn.lstm import lstm_forward
    S = 3
    rng = np.random.RandomState(5)
    x_tail = jnp.asarray(rng.randn(LOOKAHEAD, S, 256).astype(np.float32))
    p = params["joints"]["lstm"][0]
    tail = _bwd_tail(p["bwd"], x_tail)
    y, _ = lstm_forward([{"fwd": p["fwd"], "bwd": p["bwd"]}], x_tail,
                        bidirectional=True, time_major=True)
    np.testing.assert_allclose(np.asarray(tail[0]), np.asarray(y[0, :, 256:]),
                               atol=2e-5)


def test_carry_sequence_matches_per_frame_loop(net, params):
    S, N = 2, 6
    frames = jax.random.normal(jax.random.PRNGKey(9), (N, S, 60)) * 0.1
    st = net.init_carry_state_batched(S)
    run = jax.jit(net.forward_carry_sequence_batched)
    (pose_seq, joints_seq, root_seq, contact_seq), fin = run(
        params, st, frames)

    st2 = jax.tree_util.tree_map(jnp.asarray, net.init_carry_state_batched(S))
    step = jax.jit(net.forward_carry_batched)
    for t in range(N):
        (p, j, r, c), st2 = step(params, st2, frames[t])
        np.testing.assert_allclose(np.asarray(root_seq[t]), np.asarray(r),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(pose_seq[t]), np.asarray(p),
                                   atol=2e-5)


def test_carry_outputs_sane_and_rotations_valid(net, params):
    S, N = 2, 10
    frames = jax.random.normal(jax.random.PRNGKey(10), (N, S, 60)) * 0.1
    st = net.init_carry_state_batched(S)
    (pose, joints, root, contact), _ = jax.jit(
        net.forward_carry_sequence_batched)(params, st, frames)
    pose = np.asarray(pose)
    assert np.isfinite(pose).all() and np.isfinite(np.asarray(root)).all()
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), pose.shape)
    np.testing.assert_allclose(pose @ np.swapaxes(pose, -1, -2), eye,
                               atol=1e-4)


def test_bf16_streaming_keeps_f32_fusion_accumulators(net, params):
    """bf16 serving must keep the translation accumulators in float32: a
    bf16 accumulator's ulp passes a 30 Hz walking step (~5 cm) once |tran|
    reaches ~16 m, after which translation quantizes and freezes. The LSTM
    state/activations stay bf16 (that is where the throughput win is)."""
    from mobileposer_tpu.nn import cast_params
    S, N = 2, 6
    for st in (net.init_carry_state_batched(S, dtype=jnp.bfloat16),
               net.init_online_state_batched(S, dtype=jnp.bfloat16)):
        assert jnp.dtype(st.last_root_pos.dtype) == jnp.float32
        assert jnp.dtype(st.current_root_y.dtype) == jnp.float32
        assert jnp.dtype(st.last_lfoot.dtype) == jnp.float32
        assert jnp.dtype(st.vel_h.dtype) == jnp.bfloat16

    # integration keeps moving far from the origin: park a stream at 100 m
    # and verify per-frame increments survive (in bf16 they round to 0
    # whenever |increment| < 0.5 m out there)
    params_bf = cast_params(params, jnp.bfloat16)
    st = jax.tree_util.tree_map(jnp.asarray,
                                net.init_carry_state_batched(S, jnp.bfloat16))
    frames = (jax.random.normal(jax.random.PRNGKey(3), (N, S, 60)) * 0.3
              ).astype(jnp.bfloat16)
    # burn in so initialized=True and the LSTM carries are non-trivial,
    # then run the SAME frames from the same state near and far from the
    # origin — per-frame displacements must match (in a bf16 accumulator
    # they round to 0 whenever |increment| < 0.5 m at |tran| ~ 100 m)
    run = jax.jit(net.forward_carry_sequence_batched)
    _, st1 = run(params_bf, st, frames)
    (_, _, root_a, _), _ = run(params_bf, st1, frames)
    far = st1._replace(last_root_pos=st1.last_root_pos + 100.0)
    (_, _, root_b, _), _ = run(params_bf, far, frames)
    steps_near = np.diff(np.asarray(root_a, np.float64), axis=0)
    steps_far = np.diff(np.asarray(root_b, np.float64), axis=0)
    # identical per-frame displacements regardless of distance from origin
    np.testing.assert_allclose(steps_far, steps_near, atol=1e-4)
    assert np.abs(steps_near).max() > 1e-5      # the stream actually moves


def test_carry_converges_to_windowed_on_constant_input(net, params):
    """On a constant stream both modes' forward states approach the same
    fixed point, so emitted joints must agree after burn-in — a measurable
    bound on the approximation in the easiest case."""
    S, N = 1, 80
    frame = (jax.random.normal(jax.random.PRNGKey(12), (1, 60)) * 0.1)
    frames = jnp.broadcast_to(frame, (N, S, 60))
    stc = net.init_carry_state_batched(S)
    (pose_c, joints_c, _, contact_c), _ = jax.jit(
        net.forward_carry_sequence_batched)(params, stc, frames)
    stw = net.init_online_state_batched(S)
    (pose_w, joints_w, _, contact_w), _ = jax.jit(
        lambda p, s, f: net.forward_online_sequence_batched(
            p, s, f, mode="scan"))(params, stw, frames)
    np.testing.assert_allclose(np.asarray(joints_c[-1]),
                               np.asarray(joints_w[-1]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(contact_c[-1]),
                               np.asarray(contact_w[-1]), atol=1e-2)


def test_carry_streaming_sharded_over_mesh(net, params):
    """Carry-mode streams shard over the data mesh like a serving fleet
    would: stream-axis sharded state + frames, replicated params, same
    outputs as unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mobileposer_tpu.parallel import make_mesh, replicate_params
    mesh = make_mesh()
    S, N = 8, 3
    frames = jax.random.normal(jax.random.PRNGKey(30), (N, S, 60)) * 0.1
    run = jax.jit(net.forward_carry_sequence_batched)

    st0 = jax.tree_util.tree_map(jnp.asarray, net.init_carry_state_batched(S))
    (pose_ref, _, root_ref, _), _ = run(params, st0, frames)

    def shard_leaf(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == S:          # stream axis leading
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        if x.ndim >= 2 and x.shape[1] == S:          # rings / stacked carries
            return jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    st_sh = jax.tree_util.tree_map(shard_leaf, net.init_carry_state_batched(S))
    frames_sh = jax.device_put(np.asarray(frames),
                               NamedSharding(mesh, P(None, "data")))
    (pose_sh, _, root_sh, _), _ = run(replicate_params(params, mesh),
                                      st_sh, frames_sh)
    np.testing.assert_allclose(np.asarray(root_sh), np.asarray(root_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pose_sh), np.asarray(pose_ref),
                               atol=2e-5)


def test_online_protocol_carry_mode(net, params, tmp_path):
    """evaluate_pose(online_mode='carry') runs the ONLINE protocol through
    carry-mode streaming: finite metrics, comparable shape to exact — the
    parity-day A/B harness."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.evaluation import evaluate_pose
    f = tmp_path / "eval.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=30, seed=5,
                                     body_model=net.body_model)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=net.body_model,
                     data_files=[f])
    view = EvalSequence(ds, combo="lw_rp")
    res_c = evaluate_pose(net, params, view, online=True, verbose=False,
                          online_mode="carry")
    res_e = evaluate_pose(net, params, view, online=True, verbose=False,
                          online_mode="exact")
    assert res_c["online"].shape == res_e["online"].shape == (8, 2)
    assert np.all(np.isfinite(res_c["online"]))
    # offline rows identical (untouched by the online mode)
    np.testing.assert_allclose(res_c["offline"], res_e["offline"], atol=1e-5)

    import pytest
    with pytest.raises(ValueError):
        evaluate_pose(net, params, view, online=True, verbose=False,
                      online_mode="carry", batch_sequences=False)


def test_shard_stream_state_exact_axes_beat_shape_collision(net):
    """STREAM_AXES declarations make fleet sharding exact: with S equal to
    the velocity carry's layer-stack size (n_layers=2), the old shape
    heuristic would shard the LAYER axis of [n_layers, S, H] leaves; the
    declared axes shard the stream axis regardless."""
    from jax.sharding import PartitionSpec as P
    from mobileposer_tpu.parallel import make_mesh, shard_stream_state

    mesh = make_mesh(2)
    S = 2  # collides with n_layers=2 of the stacked velocity carry

    st = shard_stream_state(net.init_carry_state_batched(S), S, mesh)
    assert st.vel_h.sharding.spec == P(None, "data")       # [L, S, H]
    assert st.imu_ring.sharding.spec == P(None, "data")    # [W, S, 60]
    assert st.joints.f1_h.sharding.spec == P("data")       # [S, H]
    assert st.initialized.sharding.spec == P("data")       # [S]

    stw = shard_stream_state(net.init_online_state_batched(S), S, mesh)
    assert stw.vel_h.sharding.spec == P(None, "data")
    assert stw.imu.sharding.spec == P("data")              # [S, W, 60]
    assert stw.initialized.sharding.spec == P("data")


def test_stream_axes_match_state_structure(net):
    """STREAM_AXES pytrees mirror the real state structure exactly (a new
    state field without a declared axis fails here, loudly) and every
    declared axis indexes a real dimension of its leaf."""
    for make, axes in [
            (net.init_carry_state_batched,
             type(net.init_carry_state_batched(4)).STREAM_AXES),
            (net.init_online_state_batched,
             type(net.init_online_state_batched(4)).STREAM_AXES)]:
        st = make(4)
        assert (jax.tree_util.tree_structure(st)
                == jax.tree_util.tree_structure(axes))
        for leaf, ax in zip(jax.tree_util.tree_leaves(st),
                            jax.tree_util.tree_leaves(axes)):
            assert 0 <= ax < np.ndim(leaf)
            assert np.shape(leaf)[ax] == 4


def test_shard_stream_state_rejects_unbatched_state(net):
    """An UNBATCHED state shares its class (and STREAM_AXES) with the
    batched variant; sharding it must fail loudly instead of spreading a
    window/layer axis over the mesh."""
    from mobileposer_tpu.parallel import make_mesh, shard_stream_state
    with pytest.raises(ValueError, match="n_streams"):
        shard_stream_state(net.init_online_state(), 1, make_mesh(1))
