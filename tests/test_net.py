"""Tests for the four modules and the MobilePoserNet composite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import ParametricModel, forward_kinematics_R
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.models import (
    MODULE_CONFIGS, MobilePoserNet, footcontact_loss, forward,
    init_all_modules, joints_loss, multiscale_velocity_loss, poser_loss,
    reduced_global_to_full, reduced_global_to_full_soa, velocity_loss,
)


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


@pytest.fixture(scope="module")
def net(body):
    return MobilePoserNet(body)


@pytest.fixture(scope="module")
def params():
    return init_all_modules(jax.random.PRNGKey(0))


def test_module_shapes(params):
    B, T = 2, 9
    from mobileposer_tpu.models import module_apply
    imu = jnp.zeros((B, T, 60))
    x132 = jnp.zeros((B, T, 132))
    y, _ = module_apply("joints", params["joints"], imu)
    assert y.shape == (B, T, 72)
    y, _ = module_apply("poser", params["poser"], x132)
    assert y.shape == (B, T, 96)
    y, _ = module_apply("footcontact", params["footcontact"], x132)
    assert y.shape == (B, T, 2)
    y, hc = module_apply("velocity", params["velocity"], x132)
    assert y.shape == (B, T, 72)
    assert hc[0].shape == (2, B, 256)  # unidirectional carry


def test_reduced_global_to_full_roundtrip(body):
    """FK of the reconstructed local pose must reproduce the input global
    rotations at every reduced joint (net.py:93-99 semantics)."""
    key = jax.random.PRNGKey(1)
    n = 4
    reduced = jnp.asarray(C.joint_set.reduced)
    rots = R.generate_random_rotation_matrix(key, n * len(C.joint_set.reduced))
    rots = rots.reshape(n, -1, 3, 3)
    # Root must stay identity for the roundtrip check: joint 0's global rot
    # is copied into the local pose directly.
    r6d = R.rotation_matrix_to_r6d(rots).reshape(n, -1)
    full_local = reduced_global_to_full(r6d, body)
    assert full_local.shape == (n, 24, 3, 3)
    full_global = forward_kinematics_R(full_local, body.parent)
    np.testing.assert_allclose(np.asarray(full_global[:, reduced]),
                               np.asarray(rots), atol=1e-4)
    # Ignored (non-root) joints carry identity local rotation.
    for ig in C.joint_set.ignored:
        if ig == 0:
            continue
        np.testing.assert_allclose(np.asarray(full_local[:, ig]),
                                   np.broadcast_to(np.eye(3), (n, 3, 3)),
                                   atol=1e-6)


def test_reduced_global_to_full_soa_matches_reference_layout(body):
    """The lane-major (structure-of-arrays) assembly used by the streaming
    hot paths must match the generic layout bit-for-bit-ish: same formulas,
    only the memory layout differs."""
    key = jax.random.PRNGKey(5)
    n = 37
    r6d = jax.random.normal(key, (n, 96))        # raw, unnormalized 6D
    want = reduced_global_to_full(r6d, body)
    got = reduced_global_to_full_soa(r6d, body)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # degenerate inputs (zero vectors) take the clamped-norm path in both
    r6d0 = r6d.at[:, :12].set(0.0)
    np.testing.assert_allclose(
        np.asarray(reduced_global_to_full_soa(r6d0, body)),
        np.asarray(reduced_global_to_full(r6d0, body)), atol=1e-6)


def test_joint_positions_from_r6d_soa_matches_fk_path(body):
    """The bone-basis matmul must reproduce effective-gather + rotate +
    tree-prefix-add exactly, values AND gradients (it sits inside the
    poser training loss)."""
    from mobileposer_tpu.models.net import (joint_positions_from_r6d_soa,
                                            reduced_r6d_to_global)
    key = jax.random.PRNGKey(7)
    N = 53
    r6d = jax.random.normal(key, (N, 96))

    def reference(r6d):
        global_rot = reduced_r6d_to_global(r6d, effective=True)
        return body.joint_positions_from_global(global_rot)

    want = reference(r6d)
    got = joint_positions_from_r6d_soa(r6d, body)
    np.testing.assert_allclose(np.asarray(got).reshape(N, 72),
                               np.asarray(want).reshape(N, 72), atol=1e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(8), (N, 72))
    g_ref = jax.grad(lambda x: jnp.mean(
        (reference(x).reshape(N, 72) - tgt) ** 2))(r6d)
    g_soa = jax.grad(lambda x: jnp.mean(
        (joint_positions_from_r6d_soa(x, body) - tgt) ** 2))(r6d)
    np.testing.assert_allclose(np.asarray(g_soa), np.asarray(g_ref),
                               atol=1e-5)


def test_forward_shapes(params, body):
    B, T = 2, 7
    imu = jax.random.normal(jax.random.PRNGKey(2), (B, T, 60)) * 0.1
    pose, joints, vel, contact, vel_hc = forward(params, imu, body)
    assert pose.shape == (B, T, 24, 3, 3)
    assert joints.shape == (B, T, 72)
    assert vel.shape == (B, T, 72)
    assert contact.shape == (B, T, 2)
    # valid rotation matrices out of the pose head
    eye = np.einsum("xtjab,xtjcb->xtjac", np.asarray(pose), np.asarray(pose))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


def test_forward_offline(params, net):
    T = 12
    imu = jax.random.normal(jax.random.PRNGKey(3), (T, 60)) * 0.1
    pose, joints, tran, contact = net.forward_offline(params, imu)
    assert pose.shape == (T, 24, 3, 3)
    assert joints.shape == (T, 24, 3)
    assert tran.shape == (T, 3)
    assert contact.shape == (T, 2)
    assert np.all(np.isfinite(np.asarray(tran)))


def test_forward_online_stream(params, net):
    """Streaming must be jittable and the window must match offline
    semantics: after priming with 45 identical frames the online output at
    t=0 equals a constant-window batch pass."""
    step = jax.jit(net.forward_online)
    state = net.init_online_state()
    frame = jax.random.normal(jax.random.PRNGKey(4), (60,)) * 0.1
    (pose, joints, root, contact), state = step(params, state, frame)
    assert pose.shape == (24, 3, 3)
    assert joints.shape == (24, 3)
    assert root.shape == (3,)
    # Reference window semantics: first call repeats the frame 45x.
    window = jnp.broadcast_to(frame, (C.model_config.total_frames, 60))
    pose_b, joints_b, vel_b, contact_b, _ = forward(
        params, window[None], net.body_model)
    np.testing.assert_allclose(np.asarray(contact),
                               np.asarray(contact_b[0, C.model_config.past_frames]),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(joints).ravel(),
        np.asarray(joints_b[0, C.model_config.past_frames]), atol=1e-5)

    # Subsequent steps slide the window.
    frame2 = frame + 0.01
    (_, _, root2, _), state = step(params, state, frame2)
    assert not np.allclose(np.asarray(root), np.asarray(root2))


def test_losses_finite_and_grad(params, body):
    B, T = 2, 9
    rng = jax.random.PRNGKey(5)
    batch = {
        "imu": jax.random.normal(rng, (B, T, 60)) * 0.1,
        "joints": jax.random.normal(rng, (B, T, 72)) * 0.1,
        "pose_r6d": jnp.broadcast_to(
            jnp.array([1, 0, 0, 0, 1, 0], jnp.float32), (B, T, 24, 6)),
        "vels": jax.random.normal(rng, (B, T, 72)),
        "contacts": (jax.random.uniform(rng, (B, T, 2)) > 0.5).astype(jnp.float32),
        "lengths": jnp.array([T, T - 3]),
    }
    for name, fn in [("joints", joints_loss),
                     ("footcontact", footcontact_loss),
                     ("velocity", velocity_loss)]:
        val, grads = jax.value_and_grad(fn)(params[name], batch, rng)
        assert np.isfinite(float(val)), name
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves), name

    val, grads = jax.value_and_grad(poser_loss)(params["poser"], batch, rng,
                                                body_model=body)
    assert np.isfinite(float(val))


def test_multiscale_velocity_loss_matches_loop():
    """Check the vectorized chunk loss against a literal translation of the
    reference's chunk loop (velocity.py:78-86)."""
    rng = np.random.RandomState(0)
    B, T, D = 2, 11, 6
    pred = rng.randn(B, T, D).astype(np.float32)
    tgt = rng.randn(B, T, D).astype(np.float32)

    expected = 0.0
    for n in (1, 3, 9):
        for m in range(T // n):
            end = min(n * m + n, T)
            expected += np.mean((pred[:, m * n:end] - tgt[:, m * n:end]) ** 2)
    got = float(multiscale_velocity_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_forward_online_sequence_matches_loop(params, net):
    """The scanned streaming path must equal N successive per-frame calls."""
    N = 4
    frames = jax.random.normal(jax.random.PRNGKey(7), (N, 60)) * 0.1
    state = net.init_online_state()
    step = jax.jit(net.forward_online)
    poses, roots = [], []
    st = state
    for i in range(N):
        (p, j, r, c), st = step(params, st, frames[i])
        poses.append(np.asarray(p))
        roots.append(np.asarray(r))
    (pose_seq, joints_seq, root_seq, contact_seq), st2 = jax.jit(
        net.forward_online_sequence)(params, state, frames)
    np.testing.assert_allclose(np.asarray(pose_seq), np.stack(poses),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(root_seq), np.stack(roots),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.current_root_y),
                               np.asarray(st.current_root_y), atol=2e-5)


def test_forward_online_batched_matches_per_stream(params, net):
    """Batch-major multi-stream streaming must equal independent per-stream
    runs."""
    S, N = 3, 3
    frames = jax.random.normal(jax.random.PRNGKey(8), (N, S, 60)) * 0.1
    bstate = net.init_online_state_batched(S)
    run_b = jax.jit(net.forward_online_batched)
    outs_b = []
    for i in range(N):
        out, bstate = run_b(params, bstate, frames[i])
        outs_b.append([np.asarray(o) for o in out])

    step = jax.jit(net.forward_online)
    for s in range(S):
        st = net.init_online_state()
        for i in range(N):
            (p, j, r, c), st = step(params, st, frames[i, s])
        np.testing.assert_allclose(outs_b[N - 1][0][s], np.asarray(p),
                                   atol=3e-5, err_msg=f"pose stream {s}")
        np.testing.assert_allclose(outs_b[N - 1][2][s], np.asarray(r),
                                   atol=3e-5, err_msg=f"root stream {s}")


def test_sharded_streaming_matches_single_device(params, net):
    """Serving scale-out: the batched streaming step must run with streams
    sharded over the 8-device mesh and agree with the unsharded result."""
    from mobileposer_tpu.parallel import make_mesh, replicate_params, shard_batch
    mesh = make_mesh()
    S, N = 8, 2
    frames = jax.random.normal(jax.random.PRNGKey(11), (N, S, 60)) * 0.1

    run = jax.jit(net.forward_online_sequence_batched)
    state0 = net.init_online_state_batched(S)
    (pose_ref, _, root_ref, _), _ = run(params, state0, frames)

    from jax.sharding import NamedSharding, PartitionSpec as P
    p_rep = replicate_params(params, mesh)

    def shard_state_leaf(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == S:          # stream axis leading
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        if x.ndim >= 2 and x.shape[1] == S:          # velocity carry [2,S,H]
            return jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    state_sh = jax.tree_util.tree_map(shard_state_leaf,
                                      net.init_online_state_batched(S))
    frames_sh = jax.device_put(np.asarray(frames),
                               NamedSharding(mesh, P(None, "data")))
    (pose_sh, _, root_sh, _), _ = run(p_rep, state_sh, frames_sh)

    np.testing.assert_allclose(np.asarray(root_sh), np.asarray(root_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pose_sh), np.asarray(pose_ref),
                               atol=2e-5)


def test_forward_offline_padded_prefix_invariance(params, net):
    """Bucket-padded offline inference (the evaluation fast path) must match
    the unpadded run on the valid prefix exactly."""
    T, T_pad = 11, 24
    imu = jax.random.normal(jax.random.PRNGKey(12), (T, 60)) * 0.1
    pose_ref, joints_ref, tran_ref, contact_ref = net.forward_offline(
        params, imu)
    imu_padded = jnp.concatenate(
        [imu, jnp.repeat(imu[-1:], T_pad - T, axis=0)])
    pose_p, joints_p, tran_p, contact_p = net.forward_offline(
        params, imu_padded, length=jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(pose_p[:T]), np.asarray(pose_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(tran_p[:T]), np.asarray(tran_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(contact_p[:T]),
                               np.asarray(contact_ref), atol=2e-5)


def test_unfolded_sequence_matches_scan(params, net):
    """mode='unfolded' (windows batched, velocity carry sequential) must
    reproduce mode='scan' (per-frame replay) outputs AND final state,
    including a chunk-padding tail (N not divisible by chunk) and a
    pre-initialized stream."""
    S, N = 3, 7
    frames = jax.random.normal(jax.random.PRNGKey(21), (N, S, 60)) * 0.1
    run_scan = jax.jit(lambda p, st, f: net.forward_online_sequence_batched(
        p, st, f, mode="scan"))
    run_unf = jax.jit(lambda p, st, f: net.forward_online_sequence_batched(
        p, st, f, mode="unfolded", chunk=3))    # 7 = 2*3 + 1 -> padded tail

    st0 = net.init_online_state_batched(S)
    (pose_s, joints_s, root_s, contact_s), fin_s = run_scan(params, st0, frames)
    st0 = net.init_online_state_batched(S)
    (pose_u, joints_u, root_u, contact_u), fin_u = run_unf(params, st0, frames)

    np.testing.assert_allclose(np.asarray(pose_u), np.asarray(pose_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints_u), np.asarray(joints_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(root_u), np.asarray(root_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(contact_u), np.asarray(contact_s), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(fin_u),
                    jax.tree_util.tree_leaves(fin_s)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-5)

    # continue both from their final states: carried velocity state, window
    # and fusion anchors must all line up
    frames2 = jax.random.normal(jax.random.PRNGKey(22), (4, S, 60)) * 0.1
    (p2s, _, r2s, _), _ = run_scan(params, fin_s, frames2)
    (p2u, _, r2u, _), _ = run_unf(params, fin_u, frames2)
    np.testing.assert_allclose(np.asarray(r2u), np.asarray(r2s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p2u), np.asarray(p2s), atol=2e-5)
