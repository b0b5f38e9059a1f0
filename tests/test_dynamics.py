"""Rigid-body dynamics (physics/dynamics.py) — the RBDL-wrapper surface
(reference articulate/utils/rbdl/model.py:14-273) rebuilt in JAX.

The checks are cross-derivational, not replicas: the mass matrix comes
from Jacobians while inverse dynamics is a Newton-Euler recursion, so
`ID == M qddot + h` genuinely validates both; Newton's law for the CoM
and energy conservation validate forward dynamics end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.physics.dynamics import (DOF, BodyParams, DynamicsModel,
                                              N_BODIES)


@pytest.fixture(scope="module")
def model():
    body = ParametricModel.synthetic(num_vertices=240)
    return DynamicsModel(body_model=body)


def _rand_state(seed, q_scale=0.4, v_scale=0.8):
    rng = np.random.RandomState(seed)
    q = np.concatenate([rng.randn(3) * 0.2,
                        rng.randn(N_BODIES * 3) * q_scale]).astype(np.float32)
    qdot = (rng.randn(DOF) * v_scale).astype(np.float32)
    qddot = (rng.randn(DOF) * v_scale).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(qdot), jnp.asarray(qddot)


def test_inverse_dynamics_equals_M_qddot_plus_h(model):
    """Newton-Euler recursion vs the independently-assembled (Jacobian)
    mass matrix: ID(q, qd, qdd) == M(q) qdd + h(q, qd)."""
    for seed in (0, 1):
        q, qdot, qddot = _rand_state(seed)
        tau = model.inverse_dynamics(q, qdot, qddot)
        M = model.calc_M(q)
        h = model.calc_h(q, qdot)
        want = M @ qddot + h
        np.testing.assert_allclose(np.asarray(tau), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)


def test_forward_inverts_inverse_dynamics(model):
    q, qdot, qddot = _rand_state(2)
    tau = model.inverse_dynamics(q, qdot, qddot)
    back = model.forward_dynamics(q, qdot, tau)
    np.testing.assert_allclose(np.asarray(back), np.asarray(qddot),
                               rtol=5e-3, atol=5e-3)


def test_mass_matrix_symmetric_positive_definite(model):
    q, _, _ = _rand_state(3)
    M = np.asarray(model.calc_M(q))
    np.testing.assert_allclose(M, M.T, atol=1e-4)
    eigs = np.linalg.eigvalsh(M.astype(np.float64))
    assert eigs.min() > 0, eigs.min()


def test_body_positions_match_smpl_fk(model):
    """Dynamics FK must agree with the kinematics library's SMPL FK."""
    q, _, _ = _rand_state(4)
    aa = np.asarray(q)[3:].reshape(N_BODIES, 3)
    from mobileposer_tpu.kinematics import rotation as R
    pose = R.axis_angle_to_rotation_matrix(jnp.asarray(aa))[None]
    j0 = np.asarray(model.body_model.get_zero_pose_joint_and_vertex()[0])[0]
    tran = (np.asarray(q)[:3] - j0).astype(np.float32)
    _, joints = model.body_model.forward_kinematics(
        pose, tran=jnp.asarray(tran)[None])
    joints = np.asarray(joints).reshape(N_BODIES, 3)
    for b in (0, 4, 15, 20, 23):
        p = np.asarray(model.calc_body_position(q, b))
        np.testing.assert_allclose(p, joints[b], atol=2e-5,
                                   err_msg=f"body {b}")


def test_point_velocity_matches_finite_difference(model):
    q, qdot, _ = _rand_state(5)
    eps = 1e-4
    q2 = model.integrate_q(q, qdot, eps)
    for b in (0, 7, 20):
        pt = jnp.asarray([0.05, 0.02, -0.03])
        v = np.asarray(model.calc_point_velocity(q, qdot, b, pt))
        p1 = np.asarray(model.calc_body_to_base_coordinates(q, b, pt))
        p2 = np.asarray(model.calc_body_to_base_coordinates(q2, b, pt))
        np.testing.assert_allclose(v, (p2 - p1) / eps, rtol=2e-2, atol=2e-3)


def test_point_jacobian_times_qdot_is_velocity(model):
    q, qdot, _ = _rand_state(6)
    pt = jnp.asarray([0.0, 0.1, 0.0])
    for b in (3, 18):
        J = np.asarray(model.calc_point_Jacobian(q, b, pt))
        assert J.shape == (3, DOF)
        v = np.asarray(model.calc_point_velocity(q, qdot, b, pt))
        np.testing.assert_allclose(J @ np.asarray(qdot), v, rtol=1e-4,
                                   atol=1e-5)
        # columns of non-ancestor joints must be zero (tree sparsity)
        assert np.abs(J[:, 3 + 3 * 23: 6 + 3 * 23]).max() < 1e-6 or b == 23


def test_space_jacobian_is_adjoint_of_body_jacobian(model):
    q, _, _ = _rand_state(7)
    b = 16
    Jb = np.asarray(model.calc_body_Jacobian(q, b))
    Rw = np.asarray(model.calc_body_orientation(q, b))
    p = np.asarray(model.calc_body_position(q, b))

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                         [-v[1], v[0], 0]])

    Ad = np.zeros((6, 6))
    Ad[:3, :3] = Rw
    Ad[3:, :3] = skew(p) @ Rw
    Ad[3:, 3:] = Rw
    Js = np.asarray(model.calc_space_Jacobian(q, b))
    np.testing.assert_allclose(Js, Ad @ Jb, rtol=1e-3, atol=1e-4)


def test_unforced_com_acceleration_is_gravity(model):
    """Newton's law end-to-end: with zero applied torques the only
    external force is gravity, so the CoM must accelerate at exactly g —
    regardless of internal motion."""
    q, qdot, _ = _rand_state(8)
    qddot = model.forward_dynamics(q, qdot, jnp.zeros(DOF))
    out = model.calc_center_of_mass_position_velocity_acceleration(
        q, qdot, qddot)
    com_a = np.asarray(out[4])
    np.testing.assert_allclose(com_a, model.gravity, rtol=2e-3, atol=5e-3)


def test_static_hold_and_zmp_under_com(model):
    """tau = h(q, 0) holds the pose (qddot = 0); the ZMP of a held pose is
    the CoM's vertical projection onto the ground plane."""
    q, _, _ = _rand_state(9)
    zero = jnp.zeros(DOF)
    tau = model.calc_h(q, zero)
    qddot = model.forward_dynamics(q, zero, tau)
    np.testing.assert_allclose(np.asarray(qddot), 0.0, atol=5e-3)
    _, com = model.calc_center_of_mass_position(q, zero)
    zmp = np.asarray(model.calc_zero_moment_point(q, zero, zero))
    com = np.asarray(com)
    np.testing.assert_allclose(zmp, [com[0], 0.0, com[2]], atol=1e-4)


def test_energy_conservation_unforced(model):
    """Symplectic-Euler rollout with tau=0: total energy drift must be
    small and shrink with the step size (integrator error, not dynamics
    error)."""
    def energy(q, qdot):
        M = model.calc_M(q)
        ke = 0.5 * qdot @ (M @ qdot)
        m, com = model.calc_center_of_mass_position(q, qdot)
        pe = -m * jnp.dot(jnp.asarray(model.gravity, com.dtype), com)
        return ke + pe

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def rollout(q, qdot, dt, steps):
        def step(carry, _):
            q, qdot = carry
            qddot = model.forward_dynamics(q, qdot, jnp.zeros(DOF))
            qdot = qdot + qddot * dt
            q = model.integrate_q(q, qdot, dt)
            return (q, qdot), None
        (q, qdot), _ = jax.lax.scan(step, (q, qdot), None, length=steps)
        return q, qdot

    q0, qdot0, _ = _rand_state(10, q_scale=0.3, v_scale=0.5)
    e0 = float(energy(q0, qdot0))
    drifts = {}
    for dt, steps in ((2e-3, 100), (1e-3, 200)):   # same 0.2 s horizon
        q, qdot = rollout(q0, qdot0, dt, steps)
        drifts[dt] = abs(float(energy(q, qdot)) - e0) / max(abs(e0), 1.0)
    assert drifts[1e-3] < 0.05, drifts
    assert drifts[1e-3] < drifts[2e-3] * 0.75, drifts


def test_from_smpl_params_reasonable():
    body = ParametricModel.synthetic(num_vertices=240)
    p = BodyParams.from_smpl(body, total_mass=70.0)
    np.testing.assert_allclose(p.mass.sum(), 70.0, rtol=1e-5)
    assert (p.mass > 0).all()
    for b in range(N_BODIES):
        eigs = np.linalg.eigvalsh(p.inertia[b].astype(np.float64))
        assert eigs.min() > 0


def test_physics_optimizer_zmp_aware_anchoring(model):
    """With a DynamicsModel attached, an unbalanced pose (ZMP far from the
    planted foot) must anchor at least as hard as a balanced one, and the
    refiner stays jit-compatible."""
    from mobileposer_tpu.physics import PhysicsOptimizer
    body = model.body_model
    opt = PhysicsOptimizer(body_model=body, dynamics=model,
                           contact_threshold=0.5)
    eye_pose = jnp.broadcast_to(jnp.eye(3), (24, 3, 3))
    # lean the whole body far forward at the root -> com/ZMP leaves the
    # support box of the feet
    from mobileposer_tpu.kinematics import rotation as R
    lean = R.axis_angle_to_rotation_matrix(jnp.asarray([[1.2, 0.0, 0.0]]))[0]
    lean_pose = eye_pose.at[0].set(lean)

    contact = jnp.asarray([3.0, -3.0])          # left foot planted
    vel = jnp.zeros((24, 3))
    step = jax.jit(opt.optimize_frame)

    def drift_correction(pose):
        state = opt.reset_states()
        # frame 1 initializes anchors; frame 2 applies anchoring
        (_, tran1), state = step(pose, vel, contact, None, state,
                                 jnp.zeros(3))
        (_, tran2), _ = step(pose, vel, contact, None, state,
                             jnp.asarray([0.05, 0.0, 0.0]))  # 5 cm drift
        return float(jnp.linalg.norm(tran2 - jnp.asarray([0.05, 0.0, 0.0])))

    corr_balanced = drift_correction(eye_pose)
    corr_leaning = drift_correction(lean_pose)
    assert corr_leaning >= corr_balanced - 1e-6
    assert corr_leaning > 0.0                    # anchoring engaged


def test_physics_optimizer_no_anchor_in_flight_phase(model):
    """Without confident contact (flight phase), imbalance must NOT engage
    the anchor: the ZMP boost only amplifies contact-justified anchoring,
    it never creates anchoring on its own (an airborne foot moving is
    expected, not drift)."""
    from mobileposer_tpu.kinematics import rotation as R
    from mobileposer_tpu.physics import PhysicsOptimizer
    body = model.body_model
    opt = PhysicsOptimizer(body_model=body, dynamics=model,
                           contact_threshold=0.7)
    lean = R.axis_angle_to_rotation_matrix(jnp.asarray([[1.2, 0.0, 0.0]]))[0]
    lean_pose = jnp.broadcast_to(jnp.eye(3), (24, 3, 3)).at[0].set(lean)
    contact = jnp.asarray([-3.0, -3.0])          # both feet in the air
    vel = jnp.zeros((24, 3))
    step = jax.jit(opt.optimize_frame)

    state = opt.reset_states()
    (_, _), state = step(lean_pose, vel, contact, None, state, jnp.zeros(3))
    drifted = jnp.asarray([0.05, 0.0, 0.0])
    (_, tran2), _ = step(lean_pose, vel, contact, None, state, drifted)
    # the translation passes through un-anchored, however unbalanced the pose
    np.testing.assert_allclose(np.asarray(tran2), np.asarray(drifted),
                               atol=1e-6)
