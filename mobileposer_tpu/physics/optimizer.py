"""Physics-refinement hook (the reference's vestigial PHYSICS path).

The reference gates `from dynamics import PhysicsOptimizer` behind the
PHYSICS env var (reference net.py:66-69, 157-169, 211-217) — but the
`dynamics` module does not exist in the repo, so enabling it raises
ImportError; its rbdl/pybullet wrappers (articulate/utils/rbdl, .../bullet)
are dead code. We keep the same interface and gating, but back it with a
*working* lightweight kinematic refiner so the flag is usable:

  * per-frame pose smoothing toward the previous frame (jerk suppression)
  * contact-consistent root correction: when a foot is confidently in
    contact, the root translation is adjusted so that foot stays put

This is intentionally a refinement hook, not a full rigid-body dynamics
engine; its jit-compatible (state in, state out) design is where an
rbdl-class solver would slot in.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def physics_enabled() -> bool:
    """PHYSICS env gate (reference helpers.py getenv + net.py:66;
    numeric strings int-cast so PHYSICS=0 disables)."""
    from mobileposer_tpu.utils.helpers import getenv_flag
    return getenv_flag("PHYSICS")


class PhysicsState(NamedTuple):
    prev_pose: jnp.ndarray       # [24, 3, 3]
    prev_lfoot: jnp.ndarray      # [3]
    prev_rfoot: jnp.ndarray      # [3]
    initialized: jnp.ndarray     # bool


class PhysicsOptimizer:
    """Per-frame refiner with the reference's optimize_frame signature.

    With `dynamics` (a physics.DynamicsModel), the contact anchoring
    becomes balance-aware: the quasi-static Zero-Moment Point of the pose
    is computed each frame, and the further it falls outside the planted
    foot's support box, the harder the anchor pulls (a dynamically
    implausible pose earns less trust than the contact evidence). Without
    `dynamics` the anchoring is driven by contact probability alone."""

    def __init__(self, body_model=None, smoothing: float = 0.2,
                 contact_threshold: float = 0.7, debug: bool = False,
                 dynamics=None, support_halfwidth: float = 0.12,
                 zmp_scale: float = 0.3):
        self.body = body_model
        self.smoothing = smoothing
        self.contact_threshold = contact_threshold
        self.debug = debug
        self.dynamics = dynamics
        self.support_halfwidth = support_halfwidth
        self.zmp_scale = zmp_scale

    def _zmp_overshoot(self, pose, tran, foot_xz):
        """Quasi-static ZMP distance outside the support box around the
        planted foot (meters in the ground plane); 0 when balanced."""
        from mobileposer_tpu.kinematics import rotation as R
        aa = R.rotation_matrix_to_axis_angle(pose).reshape(-1)
        q = jnp.concatenate([tran, aa])
        zero = jnp.zeros(self.dynamics.qdot_size)
        zmp = self.dynamics.calc_zero_moment_point(q, zero, zero)
        d = jnp.abs(zmp[jnp.asarray([0, 2])] - foot_xz)
        return jnp.linalg.norm(jnp.maximum(d - self.support_halfwidth, 0.0))

    def reset_states(self) -> PhysicsState:
        return PhysicsState(
            prev_pose=jnp.broadcast_to(jnp.eye(3), (24, 3, 3)),
            prev_lfoot=jnp.zeros(3), prev_rfoot=jnp.zeros(3),
            initialized=jnp.asarray(False))

    def optimize_frame(self, pose, joint_velocity, contact, acc,
                       state: Optional[PhysicsState] = None,
                       tran: Optional[jnp.ndarray] = None):
        """Refine one frame (reference call sites: net.py:163, 216).

        pose: [24, 3, 3]; joint_velocity: [24, 3]; contact: [2] logits;
        acc: unused by this refiner (kept for signature parity).
        Returns ((pose', tran'), state').
        """
        if state is None:
            state = self.reset_states()
        tran = jnp.zeros(3) if tran is None else tran
        s = self.smoothing

        # temporal smoothing in rotation space via matrix blend + QR
        # re-orthonormalization (cheap polar-lite); skipped on first frame
        blended = (1 - s) * pose + s * state.prev_pose
        q, r = jnp.linalg.qr(blended)
        signs = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
        pose_smoothed = q * signs[..., None, :]
        pose_out = jnp.where(state.initialized, pose_smoothed, pose)

        if self.body is not None:
            _, joints = self.body.forward_kinematics(pose_out[None])
            lfoot, rfoot = joints[0, 10] + tran, joints[0, 11] + tran
            prob = jax.nn.sigmoid(jnp.asarray(contact))
            # if a foot is confidently planted, cancel its drift
            anchored = jnp.where(prob[0] > prob[1],
                                 state.prev_lfoot - lfoot,
                                 state.prev_rfoot - rfoot)
            strength = jnp.clip((jnp.max(prob) - self.contact_threshold)
                                / (1 - self.contact_threshold), 0.0, 1.0)
            if self.dynamics is not None:
                planted = jnp.where(prob[0] > prob[1], lfoot, rfoot)
                overshoot = self._zmp_overshoot(
                    pose_out, tran, planted[jnp.asarray([0, 2])])
                # ZMP outside the support box = the pose alone cannot be
                # statically balanced there -> lean harder on the contact.
                # MULTIPLICATIVE: the boost amplifies anchoring the contact
                # probability already justifies; with no confident contact
                # (strength == 0, e.g. flight phase) imbalance is expected
                # and must not pin the airborne foot.
                boost = jnp.clip(overshoot / self.zmp_scale, 0.0, 1.0)
                strength = jnp.clip(strength * (1.0 + boost), 0.0, 1.0)
            tran = tran + jnp.where(state.initialized, strength, 0.0) * anchored
            lfoot, rfoot = joints[0, 10] + tran, joints[0, 11] + tran
        else:
            lfoot = rfoot = jnp.zeros(3)

        new_state = PhysicsState(pose_out, lfoot, rfoot, jnp.asarray(True))
        return (pose_out, tran), new_state
