"""Golden-value and invariant tests for mobileposer_tpu.kinematics.rotation.

Golden values come from scipy.spatial.transform.Rotation (the same library
the reference escapes to on CPU), so passing these means parity with the
reference math without copying its code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyR

from mobileposer_tpu.kinematics import rotation as rot

RNG = np.random.RandomState(1234)


def random_rotmats(n=64):
    return ScipyR.random(n, random_state=RNG).as_matrix().astype(np.float32)


def assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=0)


class TestAxisAngle:
    def test_round_trip(self):
        a = RNG.uniform(-2, 2, (128, 3)).astype(np.float32)
        r = rot.axis_angle_to_rotation_matrix(a)
        a2 = rot.rotation_matrix_to_axis_angle(r)
        # Rodrigues round trip is exact only for |a| <= pi; wrap the input.
        golden = ScipyR.from_rotvec(a).as_rotvec()
        assert_close(a2, golden, atol=3e-5)

    def test_vs_scipy(self):
        a = RNG.uniform(-np.pi, np.pi, (64, 3)).astype(np.float32)
        assert_close(rot.axis_angle_to_rotation_matrix(a),
                     ScipyR.from_rotvec(a).as_matrix(), atol=1e-5)

    def test_zero_angle_no_nan(self):
        a = np.zeros((4, 3), np.float32)
        r = rot.axis_angle_to_rotation_matrix(a)
        assert_close(r, np.broadcast_to(np.eye(3), (4, 3, 3)))
        back = rot.rotation_matrix_to_axis_angle(np.broadcast_to(
            np.eye(3, dtype=np.float32), (4, 3, 3)).copy())
        assert np.isfinite(np.asarray(back)).all()
        assert_close(back, np.zeros((4, 3)), atol=1e-5)

    def test_pi_rotation(self):
        # angle ~ pi is the classic instability of the trace formula.
        axis = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]], np.float32)
        a = axis * np.pi
        r = rot.axis_angle_to_rotation_matrix(a)
        back = np.asarray(rot.rotation_matrix_to_axis_angle(r))
        # axis may flip sign at exactly pi; compare rotations, not vectors
        assert_close(rot.axis_angle_to_rotation_matrix(back), r, atol=1e-4)

    def test_matrix_to_axis_angle_vs_scipy(self):
        r = random_rotmats(128)
        golden = ScipyR.from_matrix(r).as_rotvec()
        assert_close(rot.rotation_matrix_to_axis_angle(r), golden, atol=5e-5)


class TestQuaternion:
    def test_quat_to_matrix_vs_scipy(self):
        q_wxyz = RNG.uniform(-1, 1, (64, 4)).astype(np.float32)
        q_wxyz /= np.linalg.norm(q_wxyz, axis=1, keepdims=True)
        q_xyzw = q_wxyz[:, [1, 2, 3, 0]]
        assert_close(rot.quaternion_to_rotation_matrix(q_wxyz),
                     ScipyR.from_quat(q_xyzw).as_matrix(), atol=1e-5)

    def test_matrix_to_quat_round_trip(self):
        r = random_rotmats(128)
        q = rot.rotation_matrix_to_quaternion(r)
        assert np.all(np.asarray(q)[:, 0] >= 0)  # canonical w >= 0
        assert_close(rot.quaternion_to_rotation_matrix(q), r, atol=1e-5)

    def test_axis_angle_quaternion_round_trip(self):
        a = RNG.uniform(-np.pi, np.pi, (64, 3)).astype(np.float32)
        q = rot.axis_angle_to_quaternion(a)
        golden = ScipyR.from_rotvec(a).as_quat()[:, [3, 0, 1, 2]]
        # sign of quaternion is arbitrary; canonicalize
        sign = np.sign(golden[:, :1]) * np.sign(np.asarray(q)[:, :1])
        assert_close(np.asarray(q) * sign, golden, atol=1e-5)


class TestR6D:
    def test_round_trip(self):
        r = random_rotmats(128)
        r6d = rot.rotation_matrix_to_r6d(r)
        assert_close(rot.r6d_to_rotation_matrix(r6d), r, atol=1e-5)

    def test_r6d_layout_is_columns(self):
        # The 6D vector stores the first two columns (reference semantics:
        # angular.py:185-192 transposes [:, :, :2]).
        r = random_rotmats(4)
        r6d = np.asarray(rot.rotation_matrix_to_r6d(r))
        assert_close(r6d[:, :3], r[:, :, 0])
        assert_close(r6d[:, 3:], r[:, :, 1])

    def test_gram_schmidt_orthonormalizes(self):
        x = RNG.uniform(-1, 1, (64, 6)).astype(np.float32)
        r = np.asarray(rot.r6d_to_rotation_matrix(x))
        eye = np.broadcast_to(np.eye(3), r.shape)
        assert_close(np.swapaxes(r, 1, 2) @ r, eye, atol=1e-5)
        assert_close(np.linalg.det(r), np.ones(64), atol=1e-5)


class TestEuler:
    @pytest.mark.parametrize("seq", ["XYZ", "xyz", "ZYX", "YXZ", "zyx"])
    def test_to_matrix_vs_scipy(self, seq):
        e = RNG.uniform(-1.4, 1.4, (64, 3)).astype(np.float32)
        assert_close(rot.euler_angle_to_rotation_matrix(e, seq),
                     ScipyR.from_euler(seq, e).as_matrix(), atol=1e-5)

    @pytest.mark.parametrize("seq", ["XYZ", "xyz", "ZYX", "YXZ"])
    def test_from_matrix_vs_scipy(self, seq):
        r = random_rotmats(64)
        assert_close(rot.rotation_matrix_to_euler_angle(r, seq),
                     ScipyR.from_matrix(r).as_euler(seq), atol=1e-4)

    @pytest.mark.parametrize("seq", ["ZXZ", "XYX", "YZY", "ZYZ", "XZX",
                                     "YXY", "zxz", "xyx", "zyz"])
    def test_proper_euler_vs_scipy(self, seq):
        """Proper (repeated-axis) sequences, intrinsic and extrinsic —
        reference surface angular.py:239-268 via scipy."""
        r = random_rotmats(64)
        assert_close(rot.rotation_matrix_to_euler_angle(r, seq),
                     ScipyR.from_matrix(r).as_euler(seq), atol=1e-4)
        e = RNG.uniform(-1.4, 1.4, (64, 3)).astype(np.float32)
        assert_close(rot.euler_angle_to_rotation_matrix(e, seq),
                     ScipyR.from_euler(seq, e).as_matrix(), atol=1e-5)

    @pytest.mark.parametrize("seq", ["ZXZ", "xyx"])
    def test_proper_euler_roundtrip(self, seq):
        """matrix -> angles -> matrix is the identity even where angle
        conventions could differ."""
        r = random_rotmats(64)
        e = rot.rotation_matrix_to_euler_angle(r, seq)
        assert_close(rot.euler_angle_to_rotation_matrix(e, seq), r,
                     atol=1e-5)

    def test_adjacent_repeat_rejected(self):
        r = random_rotmats(2)
        with pytest.raises(ValueError, match="adjacent"):
            rot.rotation_matrix_to_euler_angle(r, "XXZ")


class TestMisc:
    def test_angle_between(self):
        r1, r2 = random_rotmats(32), random_rotmats(32)
        golden = (ScipyR.from_matrix(r1).inv() * ScipyR.from_matrix(r2)).magnitude()
        assert_close(rot.angle_between(r1, r2), golden, atol=1e-4)

    def test_lerp(self):
        assert_close(rot.lerp(0.0, 10.0, 0.3), 3.0)

    def test_normalize_angle(self):
        q = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -0.5], np.float32)
        out = np.asarray(rot.normalize_angle(q))
        assert np.all(out >= -np.pi) and np.all(out < np.pi)

    def test_svd_rotate(self):
        r_true = random_rotmats(8)
        src = RNG.uniform(-1, 1, (8, 16, 3)).astype(np.float32)
        tgt = src @ np.swapaxes(r_true, 1, 2)  # rows transformed: x R^T
        r_est = np.asarray(rot.svd_rotate(src, tgt))
        # svd_rotate returns R mapping each source point p -> R @ p
        assert_close(src @ np.swapaxes(r_est, 1, 2), tgt, atol=1e-4)

    def test_random_rotation_matrices_valid(self):
        r = np.asarray(rot.generate_random_rotation_matrix(jax.random.PRNGKey(0), 16))
        eye = np.broadcast_to(np.eye(3), r.shape)
        assert_close(np.swapaxes(r, 1, 2) @ r, eye, atol=1e-5)

    def test_jit_and_vmap_compatible(self):
        a = jnp.asarray(RNG.uniform(-1, 1, (8, 3)).astype(np.float32))
        jitted = jax.jit(rot.axis_angle_to_rotation_matrix)
        assert jitted(a).shape == (8, 3, 3)
        grad = jax.grad(lambda x: rot.axis_angle_to_rotation_matrix(x).sum())(a)
        assert np.isfinite(np.asarray(grad)).all()


class TestGradientSafety:
    """Gradients through the rotation math must be finite at the numerical
    edges (zero vectors, near-pi rotations, degenerate r6d) — the poser's
    FK position loss differentiates through all of it."""

    def test_r6d_grad_finite_at_degenerate_inputs(self):
        import jax
        def loss(r6d):
            return jnp.sum(rot.r6d_to_rotation_matrix(r6d) ** 2)
        for r6d in [jnp.zeros((1, 6)),                         # all-zero
                    jnp.array([[1., 0, 0, 1, 0, 0]]),          # parallel cols
                    jnp.array([[1e-12, 0, 0, 0, 1e-12, 0]])]:  # tiny norm
            g = jax.grad(loss)(r6d)
            assert np.all(np.isfinite(np.asarray(g))), r6d

    def test_axis_angle_grad_finite_at_zero_and_pi(self):
        import jax
        def loss(aa):
            return jnp.sum(rot.axis_angle_to_rotation_matrix(aa) ** 2)
        for aa in [jnp.zeros((1, 3)),
                   jnp.array([[np.pi, 0.0, 0.0]]),
                   jnp.array([[1e-10, 0.0, 0.0]])]:
            g = jax.grad(loss)(aa)
            assert np.all(np.isfinite(np.asarray(g))), aa

    def test_log_map_grad_finite(self):
        import jax
        rots = rot.generate_random_rotation_matrix(jax.random.PRNGKey(0), 8)
        def loss(r):
            return jnp.sum(rot.rotation_matrix_to_axis_angle(r) ** 2)
        g = jax.grad(loss)(rots)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_fuzz_round_trips_random_extremes(self):
        import jax
        rng = np.random.RandomState(7)
        # angles clustered at the hard spots: ~0, ~pi, uniform
        angles = np.concatenate([rng.uniform(0, 1e-6, 30),
                                 np.pi - rng.uniform(0, 1e-6, 30),
                                 rng.uniform(0, np.pi, 40)])
        axes = rng.randn(100, 3)
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        aa = (axes * angles[:, None]).astype(np.float32)
        mats = rot.axis_angle_to_rotation_matrix(jnp.asarray(aa))
        back = rot.axis_angle_to_rotation_matrix(
            rot.rotation_matrix_to_axis_angle(mats))
        # compare as rotations (axis-angle is ambiguous at pi)
        ang = np.asarray(rot.angle_between(mats, back))
        assert np.all(ang < 5e-3), ang.max()
