"""SE(3) helpers and articulated-tree kinematics in pure jax.numpy.

Functional parity targets from the reference
`mobileposer/articulate/math/spatial.py`. The reference walks the 24-joint
kinematic tree with a per-joint Python loop of torch.bmm calls
(spatial.py:104-123); here the tree is processed *level by level*: joints at
equal depth are composed with one batched gather + matmul, so a depth-9 SMPL
tree compiles to 9 fused steps instead of 24 sequential ones. The parent list
is a static Python tuple, so everything specializes at trace time and is
jit/vmap/grad compatible.

Conventions match the reference: parent[i] < i for i > 0; parent[0] is
None/-1; local = expressed in parent frame; global = base frame.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp

from mobileposer_tpu.utils.precision import f32_matmuls


def _canon_parent(parent: Sequence) -> Tuple[int, ...]:
    """Normalize the parent list: root's parent becomes -1."""
    out = []
    for i, p in enumerate(parent):
        out.append(-1 if (i == 0 or p is None or p < 0) else int(p))
    return tuple(out)


@lru_cache(maxsize=None)
def _tree_levels(parent: Tuple[int, ...]) -> Tuple[Tuple[int, ...], ...]:
    """Group joint indices by tree depth. Level 0 is the root alone."""
    depth = [0] * len(parent)
    for i in range(1, len(parent)):
        depth[i] = depth[parent[i]] + 1
    levels = [[] for _ in range(max(depth) + 1)]
    for i, d in enumerate(depth):
        levels[d].append(i)
    return tuple(tuple(l) for l in levels)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def transformation_matrix(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Assemble homogeneous T from R [*,3,3] and p [*,3] (spatial.py:60-75)."""
    Rp = jnp.concatenate((R, p[..., None]), axis=-1)
    bottom = jnp.zeros(Rp.shape[:-2] + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate((Rp, bottom), axis=-2)


def decode_transformation_matrix(T: jnp.ndarray):
    """Split T [*,4,4] into (R [*,3,3], p [*,3]) (spatial.py:78-87)."""
    return T[..., :3, :3], T[..., :3, 3]


@f32_matmuls
def inverse_transformation_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (spatial.py:90-101)."""
    R, p = decode_transformation_matrix(T)
    invR = jnp.swapaxes(R, -1, -2)
    invp = -(invR @ p[..., None])[..., 0]
    return transformation_matrix(invR, invp)


# ---------------------------------------------------------------------------
# Tree reductions (level-parallel)
# ---------------------------------------------------------------------------

def _forward_tree_matmul(x_local: jnp.ndarray, parent: Tuple[int, ...]) -> jnp.ndarray:
    """x_global[i] = x_global[parent[i]] @ x_local[i], level by level.

    x_local: [..., J, d, d]. Replaces the sequential per-joint loop of the
    reference `_forward_tree` (spatial.py:104-112).
    """
    levels = _tree_levels(parent)
    x_global = x_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        par = jnp.asarray([parent[i] for i in level])
        composed = jnp.take(x_global, par, axis=-3) @ jnp.take(x_local, idx, axis=-3)
        x_global = x_global.at[..., idx, :, :].set(composed)
    return x_global


def _forward_tree_add(x_local: jnp.ndarray, parent: Tuple[int, ...]) -> jnp.ndarray:
    """x_global[i] = x_global[parent[i]] + x_local[i]  (vectors [..., J, 3])."""
    levels = _tree_levels(parent)
    x_global = x_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        par = jnp.asarray([parent[i] for i in level])
        composed = jnp.take(x_global, par, axis=-2) + jnp.take(x_local, idx, axis=-2)
        x_global = x_global.at[..., idx, :].set(composed)
    return x_global


@f32_matmuls
def bone_vector_to_joint_position(bone_vec: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """Accumulate bone vectors into joint positions (spatial.py:126-145)."""
    parent = _canon_parent(parent)
    bone_vec = jnp.asarray(bone_vec).reshape(bone_vec.shape[0], -1, 3)
    return _forward_tree_add(bone_vec, parent)


@f32_matmuls
def joint_position_to_bone_vector(joint_pos: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """bone[i] = pos[i] - pos[parent[i]] — fully parallel (spatial.py:148-167)."""
    parent = _canon_parent(parent)
    joint_pos = jnp.asarray(joint_pos).reshape(joint_pos.shape[0], -1, 3)
    par = jnp.asarray([0 if p < 0 else p for p in parent])
    parent_pos = jnp.take(joint_pos, par, axis=-2)
    parent_pos = parent_pos.at[..., 0, :].set(0.0)  # root keeps its position
    return joint_pos - parent_pos


@f32_matmuls
def forward_kinematics_R(R_local: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """Global joint rotations from local (spatial.py:170-194)."""
    parent = _canon_parent(parent)
    R_local = jnp.asarray(R_local).reshape(R_local.shape[0], -1, 3, 3)
    return _forward_tree_matmul(R_local, parent)


@f32_matmuls
def inverse_kinematics_R(R_global: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """Local rotations from global — one batched matmul (spatial.py:197-221).

    R_local[i] = R_global[parent[i]]^T @ R_global[i]; every joint only needs
    its parent's *global* rotation, so (unlike FK) this is embarrassingly
    parallel.
    """
    parent = _canon_parent(parent)
    R_global = jnp.asarray(R_global).reshape(R_global.shape[0], -1, 3, 3)
    par = jnp.asarray([0 if p < 0 else p for p in parent])
    parent_rot = jnp.take(R_global, par, axis=-3)
    R_local = jnp.swapaxes(parent_rot, -1, -2) @ R_global
    return R_local.at[..., 0, :, :].set(R_global[..., 0, :, :])


@f32_matmuls
def forward_kinematics_T(T_local: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """Global homogeneous transforms from local (spatial.py:224-249)."""
    parent = _canon_parent(parent)
    T_local = jnp.asarray(T_local).reshape(T_local.shape[0], -1, 4, 4)
    return _forward_tree_matmul(T_local, parent)


@f32_matmuls
def inverse_kinematics_T(T_global: jnp.ndarray, parent: Sequence) -> jnp.ndarray:
    """Local homogeneous transforms from global — parallel (spatial.py:252-277)."""
    parent = _canon_parent(parent)
    T_global = jnp.asarray(T_global).reshape(T_global.shape[0], -1, 4, 4)
    par = jnp.asarray([0 if p < 0 else p for p in parent])
    parent_T = jnp.take(T_global, par, axis=-3)
    T_local = inverse_transformation_matrix(parent_T) @ T_global
    return T_local.at[..., 0, :, :].set(T_global[..., 0, :, :])


@f32_matmuls
def joint_positions_from_global(R_global: jnp.ndarray, bone_vec: jnp.ndarray,
                                parent: Sequence) -> jnp.ndarray:
    """Joint positions directly from GLOBAL rotations.

    p[i] = p[parent[i]] + R_global[parent[i]] @ bone[i]; the rotation step
    is fully parallel (one batched matvec over all joints), leaving only
    the level-parallel prefix-add. Equivalent to inverse_kinematics_R
    followed by full FK but skips every 3x3 matmul chain — this is the fast
    path for position-only losses that already hold global rotations.

    R_global: [..., J, 3, 3]; bone_vec: [J, 3] or [..., J, 3].
    """
    parent = _canon_parent(parent)
    par = jnp.asarray([0 if p < 0 else p for p in parent])
    R_par = jnp.take(R_global, par, axis=-3)
    bone = jnp.broadcast_to(jnp.asarray(bone_vec, R_global.dtype),
                            R_global.shape[:-2] + (3,))
    rotated = (R_par @ bone[..., None])[..., 0]
    # root keeps its unrotated offset (level-0 semantics of the fused FK)
    rotated = rotated.at[..., 0, :].set(bone[..., 0, :])
    return _forward_tree_add(rotated, parent)


@f32_matmuls
def forward_kinematics(R_local: jnp.ndarray, p_local: jnp.ndarray, parent: Sequence):
    """Fused (R, p) tree FK (spatial.py:280-309) without 4x4 matmuls.

    R_global[i] = R_global[par] @ R_local[i]
    p_global[i] = p_global[par] + R_global[par] @ p_local[i]
    """
    parent = _canon_parent(parent)
    R_local = jnp.asarray(R_local).reshape(R_local.shape[0], -1, 3, 3)
    p_local = jnp.asarray(p_local).reshape(p_local.shape[0], -1, 3)
    levels = _tree_levels(parent)
    R_global, p_global = R_local, p_local
    for level in levels[1:]:
        idx = jnp.asarray(level)
        par = jnp.asarray([parent[i] for i in level])
        Rp = jnp.take(R_global, par, axis=-3)
        pp = jnp.take(p_global, par, axis=-2)
        R_global = R_global.at[..., idx, :, :].set(Rp @ jnp.take(R_local, idx, axis=-3))
        p_global = p_global.at[..., idx, :].set(
            pp + (Rp @ jnp.take(p_local, idx, axis=-2)[..., None])[..., 0])
    return R_global, p_global
