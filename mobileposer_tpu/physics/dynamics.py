"""Rigid-body dynamics on the SMPL kinematic tree, pure JAX.

Behavioral parity target: the reference's RBDL wrapper
(`articulate/utils/rbdl/model.py:14-273`), which binds the C++ `rbdl`
library for its (never-shipped) physics optimizer: forward/inverse
dynamics, mass matrix, nonlinear effects, body/point kinematics,
Jacobians, center of mass and ZMP. The TPU-native equivalent implements
the same surface directly on the SMPL skeleton — no URDF/C++ dependency —
with everything jit/grad/vmap-compatible.

Model: 24 bodies. The root is a free joint (3 translational + 3
rotational DoF), every other joint is spherical (3 DoF) — matching how
SMPL poses parameterize the body. Generalized coordinates:

  q    [75] = [root position (world, 3) | axis-angle per joint (24*3)]
  qdot [75] = [root linear velocity (world, 3) |
               relative angular velocity of each body w.r.t. its parent,
               expressed in the CHILD body frame (24*3)]

As in RBDL's spherical joints, `qdot` is an angular velocity, NOT the
time derivative of the axis-angle coordinates (integrate with
`integrate_q`).

Algorithms (world-frame formulation; J = 24 bodies is tiny, so the
per-joint recursions unroll at trace time into one fused XLA program):

  * inverse_dynamics — Newton-Euler: forward velocity/acceleration
    recursion, backward force recursion.
  * calc_M — assembled from per-body point/rotation Jacobians
    (M = sum_i Jv_i^T m_i Jv_i + Jw_i^T I_i Jw_i). This construction is
    INDEPENDENT of the Newton-Euler recursion, so the identity
    ID(q, qd, qdd) == M(q) qdd + h(q, qd) is a genuine cross-check
    (pinned in tests/test_dynamics.py).
  * forward_dynamics — qddot = solve(M, tau - h). The reference calls
    RBDL's Articulated Body Algorithm; at 75 DoF a dense solve is
    numerically identical, a few microseconds on TPU, and keeps the
    implementation verifiable. (Documented divergence: O(n^3) vs O(n).)
  * CoM position/velocity/acceleration, angular momentum and its rate,
    and the Zero-Moment Point, matching the reference's
    calc_center_of_mass_* / calc_zero_moment_point outputs.

Body inertial parameters come from `BodyParams`: pass measured values, or
use `BodyParams.from_smpl` — a documented anthropometric approximation
(segment masses proportional to bone length, solid-ellipsoid inertia)
for use when no measured URDF exists (the reference's physics.urdf is a
missing large blob).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics.smpl import SMPL_PARENTS
from mobileposer_tpu.utils.precision import f32_matmuls

GRAVITY = np.array([0.0, -9.81, 0.0])
N_BODIES = 24
DOF = 3 + N_BODIES * 3            # 75


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)


class BodyParams(NamedTuple):
    """Per-body inertial parameters (all in each body's local frame)."""
    mass: np.ndarray        # [24]
    com: np.ndarray         # [24, 3] center of mass offset from joint
    inertia: np.ndarray     # [24, 3, 3] rotational inertia about the com

    @classmethod
    def from_smpl(cls, body_model, total_mass: float = 70.0) -> "BodyParams":
        """Anthropometric approximation from the skeleton geometry: each
        body's mass is proportional to the total length of its child
        bones (plus a floor so leaves carry mass), its com sits at the
        mean child-bone midpoint, and its inertia is a solid ellipsoid
        around that com. Replace with measured values when available."""
        j, _ = body_model.get_zero_pose_joint_and_vertex()
        j = np.asarray(j)
        parents = np.asarray(SMPL_PARENTS)
        children = [[] for _ in range(N_BODIES)]
        for b in range(1, N_BODIES):
            children[int(parents[b])].append(b)

        seg_len = np.zeros(N_BODIES)
        com = np.zeros((N_BODIES, 3))
        for b in range(N_BODIES):
            if children[b]:
                offs = np.stack([j[c] - j[b] for c in children[b]])
                seg_len[b] = np.linalg.norm(offs, axis=1).sum()
                com[b] = offs.mean(axis=0) / 2.0
            else:                         # leaf: small stub segment
                seg_len[b] = 0.08
                com[b] = np.zeros(3)
        weight = seg_len + 0.05
        mass = total_mass * weight / weight.sum()

        inertia = np.zeros((N_BODIES, 3, 3))
        for b in range(N_BODIES):
            a = max(seg_len[b], 0.08) / 2.0       # semi-length
            r_ = 0.25 * max(seg_len[b], 0.08)     # radius
            # solid ellipsoid semi-axes (a, r, r)
            ix = 0.4 * mass[b] * (r_ * r_)
            iy = 0.2 * mass[b] * (a * a + r_ * r_)
            # identity floor: leaf segments otherwise give M(q) eigenvalues
            # ~1e-4 kg m^2, whose f32 inversion amplifies round-off into
            # percent-level qddot noise. These params are an approximation
            # anyway; the floor trades a little physical fidelity at the
            # extremities for well-conditioned f32 dynamics.
            inertia[b] = np.diag([iy, ix, iy]) + np.eye(3) * 2e-3
        return cls(mass.astype(np.float32), com.astype(np.float32),
                   inertia.astype(np.float32))


class DynamicsModel:
    """RBDLModel-equivalent surface on the SMPL tree (reference:
    articulate/utils/rbdl/model.py:14-273). `body` arguments are plain
    ints or int-valued enums (SMPL joint indices)."""

    def __init__(self, body_model=None, params: Optional[BodyParams] = None,
                 gravity=GRAVITY, total_mass: float = 70.0):
        if body_model is None:
            from mobileposer_tpu import config as C
            from mobileposer_tpu.kinematics.smpl import ParametricModel
            body_model = ParametricModel.from_file_or_synthetic(
                C.paths.smpl_file)
        self.body_model = body_model
        self.params = params or BodyParams.from_smpl(body_model, total_mass)
        self.gravity = np.asarray(gravity, np.float32)
        self.q_size = DOF
        self.qdot_size = DOF
        j, _ = body_model.get_zero_pose_joint_and_vertex()
        j = np.asarray(j, np.float32)
        par = np.asarray(SMPL_PARENTS)
        # bone offset of body b in the parent frame (root offset unused;
        # the root's world position comes from q[:3])
        self._offset = j - j[np.where(par < 0, 0, par)]
        self._parents = [int(p) for p in par]

    # -- kinematic recursions ------------------------------------------------
    def _split_q(self, q):
        root_pos = q[:3]
        aa = q[3:].reshape(N_BODIES, 3)
        return root_pos, aa

    def _fk(self, q):
        """World rotation R_i and joint origin p_i per body."""
        root_pos, aa = self._split_q(q)
        R_loc = R.axis_angle_to_rotation_matrix(aa)       # [24, 3, 3]
        Rw = [None] * N_BODIES
        p = [None] * N_BODIES
        Rw[0] = R_loc[0]
        p[0] = root_pos
        for b in range(1, N_BODIES):
            lam = self._parents[b]
            Rw[b] = Rw[lam] @ R_loc[b]
            p[b] = p[lam] + Rw[lam] @ jnp.asarray(self._offset[b])
        return jnp.stack(Rw), jnp.stack(p)

    def _vel(self, q, qdot):
        """World angular velocity w_i and joint-origin linear velocity v_i."""
        Rw, p = self._fk(q)
        u = qdot[3:].reshape(N_BODIES, 3)
        w = [None] * N_BODIES
        v = [None] * N_BODIES
        w[0] = Rw[0] @ u[0]
        v[0] = qdot[:3]
        for b in range(1, N_BODIES):
            lam = self._parents[b]
            w[b] = w[lam] + Rw[b] @ u[b]
            v[b] = v[lam] + jnp.cross(w[lam], p[b] - p[lam])
        return Rw, p, jnp.stack(w), jnp.stack(v)

    def _acc(self, q, qdot, qddot):
        """Adds world angular/linear accelerations of each joint origin."""
        Rw, p, w, v = self._vel(q, qdot)
        u = qdot[3:].reshape(N_BODIES, 3)
        ud = qddot[3:].reshape(N_BODIES, 3)
        alpha = [None] * N_BODIES
        a = [None] * N_BODIES
        # root: w_parent = 0, so the w_parent x (R u) term vanishes
        alpha[0] = Rw[0] @ ud[0]
        a[0] = qddot[:3]
        for b in range(1, N_BODIES):
            lam = self._parents[b]
            rel = Rw[b] @ u[b]
            alpha[b] = alpha[lam] + Rw[b] @ ud[b] + jnp.cross(w[lam], rel)
            d = p[b] - p[lam]
            a[b] = a[lam] + jnp.cross(alpha[lam], d) \
                + jnp.cross(w[lam], jnp.cross(w[lam], d))
        return Rw, p, w, v, jnp.stack(alpha), jnp.stack(a)

    # -- dynamics -------------------------------------------------------------
    @f32_matmuls
    def inverse_dynamics(self, q, qdot, qddot):
        """Newton-Euler: generalized forces tau [75] for a prescribed
        motion (reference: model.py:44-55)."""
        Rw, p, w, v, alpha, a = self._acc(q, qdot, qddot)
        m = jnp.asarray(self.params.mass)
        c_loc = jnp.asarray(self.params.com)
        I_loc = jnp.asarray(self.params.inertia)
        g = jnp.asarray(self.gravity)

        c_off = jnp.einsum("bij,bj->bi", Rw, c_loc)       # com offset, world
        I_w = jnp.einsum("bij,bjk,blk->bil", Rw, I_loc, Rw)
        a_com = a + jnp.cross(alpha, c_off) \
            + jnp.cross(w, jnp.cross(w, c_off))
        F = m[:, None] * (a_com - g)                      # [24, 3]
        N = jnp.einsum("bij,bj->bi", I_w, alpha) \
            + jnp.cross(w, jnp.einsum("bij,bj->bi", I_w, w))

        f = [F[b] for b in range(N_BODIES)]
        n = [N[b] + jnp.cross(c_off[b], F[b]) for b in range(N_BODIES)]
        for b in range(N_BODIES - 1, 0, -1):
            lam = self._parents[b]
            f[lam] = f[lam] + f[b]
            n[lam] = n[lam] + n[b] + jnp.cross(p[b] - p[lam], f[b])

        tau = [None] * N_BODIES
        for b in range(N_BODIES):
            tau[b] = Rw[b].T @ n[b]                       # child-frame torque
        return jnp.concatenate([f[0], jnp.concatenate(tau)])

    @f32_matmuls
    def calc_h(self, q, qdot):
        """Nonlinear effects h(q, qdot): Coriolis/centrifugal + gravity
        (reference: model.py:68-78)."""
        return self.inverse_dynamics(q, qdot, jnp.zeros(DOF))

    def _body_jacobians(self, q):
        """Per-body world Jacobians at the coms: Jv [24, 3, 75] maps qdot
        to com linear velocity, Jw [24, 3, 75] to body angular velocity.
        Independent of the Newton-Euler recursion (used to assemble M)."""
        Rw, p = self._fk(q)
        c_w = p + jnp.einsum("bij,bj->bi", Rw,
                             jnp.asarray(self.params.com))
        ancestors = []
        for b in range(N_BODIES):
            chain, a_ = [], b
            while a_ >= 0:
                chain.append(a_)
                a_ = self._parents[a_] if a_ > 0 else -1
            ancestors.append(chain)

        eye3 = jnp.eye(3)
        Jv = jnp.zeros((N_BODIES, 3, DOF))
        Jw = jnp.zeros((N_BODIES, 3, DOF))
        for b in range(N_BODIES):
            Jv = Jv.at[b, :, 0:3].set(eye3)               # root translation
            for a_ in ancestors[b]:
                col = slice(3 + 3 * a_, 6 + 3 * a_)
                Jw = Jw.at[b, :, col].set(Rw[a_])
                Jv = Jv.at[b, :, col].set(-_skew(c_w[b] - p[a_]) @ Rw[a_])
        return Jv, Jw, Rw, p, c_w

    @f32_matmuls
    def calc_M(self, q):
        """Joint-space inertia matrix M(q) [75, 75]
        (reference: model.py:57-66)."""
        Jv, Jw, Rw, _, _ = self._body_jacobians(q)
        m = jnp.asarray(self.params.mass)
        I_loc = jnp.asarray(self.params.inertia)
        I_w = jnp.einsum("bij,bjk,blk->bil", Rw, I_loc, Rw)
        M = jnp.einsum("b,bik,bil->kl", m, Jv, Jv) \
            + jnp.einsum("bik,bij,bjl->kl", Jw, I_w, Jw)
        return M

    @f32_matmuls
    def forward_dynamics(self, q, qdot, tau):
        """qddot [75] from applied generalized forces (reference:
        model.py:31-42, RBDL's ABA; here a Cholesky solve — identical
        result, O(75^3) is negligible, and M/h stay cross-checkable).
        One iterative-refinement step recovers the digits f32 loses on
        M's small leaf-inertia eigenvalues."""
        M = self.calc_M(q)
        h = self.calc_h(q, qdot)
        rhs = tau - h
        cf = jax.scipy.linalg.cho_factor(M)
        qddot = jax.scipy.linalg.cho_solve(cf, rhs)
        r = rhs - M @ qddot
        return qddot + jax.scipy.linalg.cho_solve(cf, r)

    # -- body / point kinematics ----------------------------------------------
    @staticmethod
    def _bid(body) -> int:
        return int(getattr(body, "value", body))

    @f32_matmuls
    def calc_body_to_base_coordinates(self, q, body, point=None):
        """Body-frame point -> world (reference: model.py:80-91)."""
        b = self._bid(body)
        Rw, p = self._fk(q)
        pt = jnp.zeros(3) if point is None else jnp.asarray(point)
        return p[b] + Rw[b] @ pt

    @f32_matmuls
    def calc_base_to_body_coordinates(self, q, body, point=None):
        b = self._bid(body)
        Rw, p = self._fk(q)
        pt = jnp.zeros(3) if point is None else jnp.asarray(point)
        return Rw[b].T @ (pt - p[b])

    def calc_body_position(self, q, body):
        return self.calc_body_to_base_coordinates(q, body)

    def calc_body_orientation(self, q, body):
        b = self._bid(body)
        Rw, _ = self._fk(q)
        return Rw[b]

    @f32_matmuls
    def calc_point_Jacobian(self, q, body, point=None):
        """3D world Jacobian of a body-fixed point: J qdot = world point
        velocity (reference: model.py:153-166). Computed with jax.jacobian
        of the point map — exact, and consistent by construction with
        calc_point_velocity."""
        b = self._bid(body)
        pt = jnp.zeros(3) if point is None else jnp.asarray(point)
        return jax.jacobian(
            lambda qdot: self.calc_point_velocity(q, qdot, b, pt))(
                jnp.zeros(DOF))

    @f32_matmuls
    def calc_body_Jacobian(self, q, body):
        """6D Jacobian [angular; linear] of the body frame expressed in
        the BODY frame (reference: model.py:126-136)."""
        b = self._bid(body)
        Jv, Jw, Rw, p, c_w = self._body_jacobians(q)
        # _body_jacobians' Jv is at the com; shift back to the joint origin
        Jv_origin = Jv[b] + _skew(c_w[b] - p[b]) @ Jw[b]
        return jnp.concatenate([Rw[b].T @ Jw[b], Rw[b].T @ Jv_origin])

    @f32_matmuls
    def calc_space_Jacobian(self, q, body):
        """6D space Jacobian [angular; linear] in the base frame
        (reference: model.py:138-151 computes Ad_{T_sb} @ body Jacobian;
        equivalently the linear rows give the velocity of the body point
        instantaneously at the origin: v_s = v_origin - w x p)."""
        b = self._bid(body)
        Jv, Jw, Rw, p, c_w = self._body_jacobians(q)
        Jv_origin = Jv[b] + _skew(c_w[b] - p[b]) @ Jw[b]
        # v_s = v_origin - w x p = (Jv_origin + skew(p) Jw) qdot
        return jnp.concatenate([Jw[b], Jv_origin + _skew(p[b]) @ Jw[b]])

    @f32_matmuls
    def calc_point_velocity(self, q, qdot, body, point=None):
        b = self._bid(body)
        Rw, p, w, v = self._vel(q, qdot)
        pt = jnp.zeros(3) if point is None else jnp.asarray(point)
        return v[b] + jnp.cross(w[b], Rw[b] @ pt)

    @f32_matmuls
    def calc_point_acceleration(self, q, qdot, qddot, body, point=None):
        b = self._bid(body)
        Rw, p, w, v, alpha, a = self._acc(q, qdot, qddot)
        pt = jnp.zeros(3) if point is None else jnp.asarray(point)
        off = Rw[b] @ pt
        return a[b] + jnp.cross(alpha[b], off) \
            + jnp.cross(w[b], jnp.cross(w[b], off))

    # -- center of mass / ZMP --------------------------------------------------
    def _com_terms(self, q, qdot, qddot=None):
        Rw, p, w, v, alpha, a = self._acc(
            q, qdot, jnp.zeros(DOF) if qddot is None else qddot)
        m = jnp.asarray(self.params.mass)
        c_loc = jnp.asarray(self.params.com)
        I_loc = jnp.asarray(self.params.inertia)
        c_off = jnp.einsum("bij,bj->bi", Rw, c_loc)
        c_w = p + c_off
        v_c = v + jnp.cross(w, c_off)
        a_c = a + jnp.cross(alpha, c_off) + jnp.cross(w, jnp.cross(w, c_off))
        I_w = jnp.einsum("bij,bjk,blk->bil", Rw, I_loc, Rw)
        return m, c_w, v_c, a_c, w, alpha, I_w

    @f32_matmuls
    def calc_center_of_mass_position(self, q, qdot):
        m, c_w, *_ = self._com_terms(q, qdot)
        mass = jnp.sum(m)
        return mass, jnp.einsum("b,bi->i", m, c_w) / mass

    @f32_matmuls
    def calc_center_of_mass_position_velocity(self, q, qdot):
        m, c_w, v_c, a_c, w, alpha, I_w = self._com_terms(q, qdot)
        mass = jnp.sum(m)
        com = jnp.einsum("b,bi->i", m, c_w) / mass
        com_v = jnp.einsum("b,bi->i", m, v_c) / mass
        # angular momentum about the com
        L = jnp.einsum("bij,bj->i", I_w, w) \
            + jnp.einsum("b,bi->i", m, jnp.cross(c_w - com, v_c))
        return mass, com, com_v, L

    @f32_matmuls
    def calc_center_of_mass_position_velocity_acceleration(self, q, qdot,
                                                           qddot):
        m, c_w, v_c, a_c, w, alpha, I_w = self._com_terms(q, qdot, qddot)
        mass = jnp.sum(m)
        com = jnp.einsum("b,bi->i", m, c_w) / mass
        com_v = jnp.einsum("b,bi->i", m, v_c) / mass
        com_a = jnp.einsum("b,bi->i", m, a_c) / mass
        L = jnp.einsum("bij,bj->i", I_w, w) \
            + jnp.einsum("b,bi->i", m, jnp.cross(c_w - com, v_c))
        dL = jnp.einsum("bij,bj->i", I_w, alpha) \
            + jnp.cross(w, jnp.einsum("bij,bj->bi", I_w, w)).sum(axis=0) \
            + jnp.einsum("b,bi->i", m, jnp.cross(c_w - com, a_c))
        return mass, com, com_v, L, com_a, dL

    @f32_matmuls
    def calc_zero_moment_point(self, q, qdot, qddot,
                               plane_normal=np.array([0.0, 1.0, 0.0])):
        """ZMP on the plane through the origin with the given normal
        (reference: model.py:251-263): the point where the tipping moment
        of gravity + inertial forces vanishes in the plane."""
        mass, com, com_v, L, com_a, dL = \
            self.calc_center_of_mass_position_velocity_acceleration(
                q, qdot, qddot)
        n = jnp.asarray(plane_normal, com.dtype)
        g = jnp.asarray(self.gravity, com.dtype)
        f_gi = mass * (g - com_a)                 # gravity+inertia wrench
        m_gi = jnp.cross(com, f_gi) - dL          # moment about origin
        denom = jnp.dot(n, f_gi)
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        return jnp.cross(n, m_gi) / denom

    # -- integration helper ----------------------------------------------------
    @f32_matmuls
    def integrate_q(self, q, qdot, dt: float):
        """Semi-implicit update of q by qdot over dt: root position moves
        in the world; each local rotation composes with exp(u dt) (u is
        the child-frame relative angular velocity, so R_loc <- R_loc
        exp(skew(u) dt))."""
        root_pos, aa = self._split_q(q)
        u = qdot[3:].reshape(N_BODIES, 3)
        R_loc = R.axis_angle_to_rotation_matrix(aa)
        dR = R.axis_angle_to_rotation_matrix(u * dt)
        R_new = jnp.einsum("bij,bjk->bik", R_loc, dR)
        aa_new = R.rotation_matrix_to_axis_angle(R_new)
        return jnp.concatenate([root_pos + qdot[:3] * dt,
                                aa_new.reshape(-1)])
