"""Tests for tree kinematics (spatial.py) and the SMPL model (smpl.py).

Golden values come from an independent brute-force numpy implementation of
tree FK (sequential per-joint, straight from the definition), so the
level-parallel TPU version is checked against first principles.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

from mobileposer_tpu.kinematics import rotation as rot
from mobileposer_tpu.kinematics import spatial as sp
from mobileposer_tpu.kinematics.smpl import (SMPL_PARENTS, ParametricModel,
                                             synthetic_smpl_arrays)

RNG = np.random.RandomState(7)
PARENT = list(SMPL_PARENTS)
J = len(PARENT)


def random_local_rots(n):
    return ScipyR.random(n * J, random_state=RNG).as_matrix().reshape(
        n, J, 3, 3).astype(np.float32)


def fk_bruteforce(R_local, p_local):
    """Definitionally sequential FK: straight from the recurrence."""
    n = R_local.shape[0]
    Rg = np.zeros_like(R_local)
    pg = np.zeros_like(p_local)
    Rg[:, 0] = R_local[:, 0]
    pg[:, 0] = p_local[:, 0]
    for i in range(1, J):
        p = PARENT[i]
        Rg[:, i] = Rg[:, p] @ R_local[:, i]
        pg[:, i] = pg[:, p] + np.einsum("nab,nb->na", Rg[:, p], p_local[:, i])
    return Rg, pg


def assert_close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=0)


class TestTreeOps:
    def test_forward_kinematics_R_matches_bruteforce(self):
        R_local = random_local_rots(4)
        golden, _ = fk_bruteforce(R_local, np.zeros((4, J, 3), np.float32))
        assert_close(sp.forward_kinematics_R(R_local, PARENT), golden)

    def test_fk_ik_R_round_trip(self):
        R_local = random_local_rots(4)
        R_global = sp.forward_kinematics_R(R_local, PARENT)
        assert_close(sp.inverse_kinematics_R(R_global, PARENT), R_local, atol=1e-5)

    def test_fused_fk_matches_bruteforce(self):
        R_local = random_local_rots(3)
        p_local = RNG.uniform(-1, 1, (3, J, 3)).astype(np.float32)
        gR, gp = fk_bruteforce(R_local, p_local)
        Rg, pg = sp.forward_kinematics(R_local, p_local, PARENT)
        assert_close(Rg, gR)
        assert_close(pg, gp, atol=1e-5)

    def test_fk_T_matches_fused(self):
        R_local = random_local_rots(2)
        p_local = RNG.uniform(-1, 1, (2, J, 3)).astype(np.float32)
        T_local = sp.transformation_matrix(jnp.asarray(R_local), jnp.asarray(p_local))
        T_global = sp.forward_kinematics_T(T_local, PARENT)
        Rg, pg = sp.decode_transformation_matrix(T_global)
        Rg2, pg2 = sp.forward_kinematics(R_local, p_local, PARENT)
        assert_close(Rg, Rg2, atol=1e-5)
        assert_close(pg, pg2, atol=1e-5)

    def test_fk_ik_T_round_trip(self):
        R_local = random_local_rots(2)
        p_local = RNG.uniform(-1, 1, (2, J, 3)).astype(np.float32)
        T_local = sp.transformation_matrix(jnp.asarray(R_local), jnp.asarray(p_local))
        T_global = sp.forward_kinematics_T(T_local, PARENT)
        assert_close(sp.inverse_kinematics_T(T_global, PARENT), T_local, atol=1e-4)

    def test_bone_vector_round_trip(self):
        pos = RNG.uniform(-1, 1, (5, J, 3)).astype(np.float32)
        bones = sp.joint_position_to_bone_vector(pos, PARENT)
        back = sp.bone_vector_to_joint_position(bones, PARENT)
        assert_close(back, pos, atol=1e-5)

    def test_transformation_matrix_layout(self):
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)).copy()
        p = np.arange(6, dtype=np.float32).reshape(2, 3)
        T = np.asarray(sp.transformation_matrix(jnp.asarray(R), jnp.asarray(p)))
        assert T.shape == (2, 4, 4)
        assert_close(T[:, 3], np.array([[0, 0, 0, 1], [0, 0, 0, 1]]))
        assert_close(T[:, :3, 3], p)

    def test_inverse_transformation(self):
        R_local = random_local_rots(1)[:, :2]
        p = RNG.uniform(-1, 1, (1, 2, 3)).astype(np.float32)
        T = sp.transformation_matrix(jnp.asarray(R_local), jnp.asarray(p))
        invT = sp.inverse_transformation_matrix(T)
        eye = np.broadcast_to(np.eye(4), (1, 2, 4, 4))
        assert_close(np.asarray(T) @ np.asarray(invT), eye, atol=1e-5)


class TestSMPL:
    def test_zero_pose_identity_fk(self):
        m = ParametricModel.synthetic(num_vertices=480)
        j0, v0 = m.get_zero_pose_joint_and_vertex()
        pose = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        Rg, jg, vg = m.forward_kinematics(pose, calc_mesh=True)
        assert_close(jg[0], j0, atol=1e-5)
        assert_close(vg[0], v0, atol=1e-4)
        assert_close(Rg, np.broadcast_to(np.eye(3), (2, 24, 3, 3)))

    def test_root_rotation_rotates_everything(self):
        m = ParametricModel.synthetic(num_vertices=480)
        j0, _ = m.get_zero_pose_joint_and_vertex()
        root = ScipyR.from_euler("y", 0.7).as_matrix().astype(np.float32)
        pose = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 24, 3, 3)).copy()
        pose[0, 0] = root
        _, jg = m.forward_kinematics(jnp.asarray(pose))
        assert_close(jg[0], np.asarray(j0) @ root.T, atol=1e-5)

    def test_translation_added(self):
        m = ParametricModel.synthetic(num_vertices=480)
        pose = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        tran = jnp.asarray([[1.0, 2.0, 3.0]])
        _, jg = m.forward_kinematics(pose, tran=tran)
        _, jg0 = m.forward_kinematics(pose)
        diff = np.asarray(jg) - np.asarray(jg0)
        assert_close(diff, np.broadcast_to(np.array([1.0, 2.0, 3.0]), (1, 24, 3)), atol=1e-6)

    def test_shape_changes_body(self):
        m = ParametricModel.synthetic(num_vertices=480)
        pose = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        shape = jnp.ones((1, 10))
        _, j_shaped = m.forward_kinematics(pose, shape=shape)
        _, j_mean = m.forward_kinematics(pose)
        assert not np.allclose(np.asarray(j_shaped), np.asarray(j_mean))

    def test_lbs_rigid_limb_moves_with_joint(self):
        # Rotate the whole body rigidly via root: mesh must rotate rigidly.
        m = ParametricModel.synthetic(num_vertices=480)
        root = ScipyR.from_euler("z", 0.5).as_matrix().astype(np.float32)
        pose = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 24, 3, 3)).copy()
        pose[0, 0] = root
        _, _, vg = m.forward_kinematics(jnp.asarray(pose), calc_mesh=True)
        _, v0 = m.get_zero_pose_joint_and_vertex()
        assert_close(vg[0], np.asarray(v0) @ root.T, atol=1e-4)

    def test_ik_of_fk_pose(self):
        m = ParametricModel.synthetic(num_vertices=480)
        local = random_local_rots(2)
        glob = m.forward_kinematics_R(jnp.asarray(local))
        back = m.inverse_kinematics_R(glob)
        assert_close(back, local, atol=1e-5)

    def test_feet_are_lowest_in_zero_pose(self):
        m = ParametricModel.synthetic()
        j0, _ = m.get_zero_pose_joint_and_vertex()
        j0 = np.asarray(j0)
        floor_y = j0[10:12, 1].min()
        assert floor_y == j0[:, 1].min()


class TestPositionsFromGlobal:
    def test_matches_ik_fk_roundtrip(self):
        """joint_positions_from_global(R_g) must equal FK positions of the
        IK'd local pose (the path it replaces in the poser loss)."""
        import jax
        from mobileposer_tpu.kinematics import (
            ParametricModel, inverse_kinematics_R)
        from mobileposer_tpu.kinematics import rotation as rot
        body = ParametricModel.synthetic(num_vertices=96)
        n = 6
        aa = jax.random.normal(jax.random.PRNGKey(0), (n * 24, 3)) * 0.3
        R_local = rot.axis_angle_to_rotation_matrix(aa).reshape(n, 24, 3, 3)
        R_global, joints_ref = body.forward_kinematics(R_local)
        joints_fast = body.joint_positions_from_global(R_global)
        np.testing.assert_allclose(np.asarray(joints_fast),
                                   np.asarray(joints_ref), atol=1e-5)

    def test_grad_finite(self):
        import jax, jax.numpy as jnp
        from mobileposer_tpu.kinematics import ParametricModel
        body = ParametricModel.synthetic(num_vertices=96)
        def loss(R_g):
            return jnp.sum(body.joint_positions_from_global(R_g) ** 2)
        R_g = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        g = jax.grad(loss)(R_g)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_effective_globals_match_reference_ik_fk_path(self):
        """The poser loss's fast position path must equal the reference's
        IK -> identity-at-ignored -> FK pipeline for RANDOM reduced
        rotations (feet/hands must rotate with knees/wrists)."""
        import jax, jax.numpy as jnp
        from mobileposer_tpu import config as C
        from mobileposer_tpu.kinematics import ParametricModel
        from mobileposer_tpu.kinematics import rotation as rot
        from mobileposer_tpu.models.net import (
            reduced_global_to_full, reduced_r6d_to_global)
        body = ParametricModel.synthetic(num_vertices=96)
        n = 5
        rots = rot.generate_random_rotation_matrix(
            jax.random.PRNGKey(3), n * C.joint_set.n_reduced)
        r6d = rot.rotation_matrix_to_r6d(rots).reshape(n, -1)
        # reference-style: assemble -> IK -> identity at ignored -> FK
        full_local = reduced_global_to_full(r6d, body)
        _, joints_ref = body.forward_kinematics(full_local)
        # fast path: effective globals -> positions
        eff = reduced_r6d_to_global(r6d, effective=True)
        joints_fast = body.joint_positions_from_global(eff)
        np.testing.assert_allclose(np.asarray(joints_fast),
                                   np.asarray(joints_ref), atol=1e-5)


def test_smpl_joint_enum():
    """Named SMPL joint vocabulary (reference armature.py:35-64): IntEnum
    members slot in anywhere an index does (e.g. evaluator align_joint)."""
    from mobileposer_tpu.kinematics import NUM_JOINTS, SMPL_PARENTS, SMPLJoint
    assert SMPLJoint.ROOT == 0 and SMPLJoint.PELVIS == 0
    assert SMPLJoint.LFOOT == 10 and SMPLJoint.RFOOT == 11
    assert SMPLJoint.RHAND == NUM_JOINTS - 1
    # feet hang off the knees' chains via the ankles
    assert SMPL_PARENTS[SMPLJoint.LFOOT] == SMPLJoint.LANKLE
    assert int(SMPLJoint.HEAD) == 15  # usable as a plain index
