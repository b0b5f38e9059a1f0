"""Rotation-representation math in pure jax.numpy.

Functional parity targets (behavior, not code) from the reference
`mobileposer/articulate/math/angular.py` and `general.py`, with the CPU
escapes removed: the reference converts rotation matrices to axis-angle via
`cv2.Rodrigues` on host (angular.py:154-164) and eulers via scipy
(angular.py:239-268); here everything is closed-form jnp and jit/vmap/grad
compatible. Quaternions are wxyz; euler angles follow scipy's convention
(uppercase seq = intrinsic, lowercase = extrinsic).

Shapes: all functions are batched over leading dimensions; rotations may be
passed in any shape reshapeable to [..., rep_dim].
"""

from __future__ import annotations

import enum
import jax
import jax.numpy as jnp

from mobileposer_tpu.utils.precision import f32_matmuls

_EPS = 1e-8


def _safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = True):
    """Norm whose gradient is finite at x == 0.

    `jnp.linalg.norm` has a NaN gradient at the origin (d|x|/dx = x/|x|);
    clamping the *squared* norm before the sqrt keeps both the value
    (>= _EPS instead of 0) and the gradient finite — required because the
    training losses differentiate through these conversions.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))


class RotationRepresentation(enum.Enum):
    AXIS_ANGLE = 0
    ROTATION_MATRIX = 1
    QUATERNION = 2
    R6D = 3
    EULER_ANGLE = 4


# ---------------------------------------------------------------------------
# General helpers
# ---------------------------------------------------------------------------

def lerp(a, b, t):
    """Unclamped linear interpolation (reference: general.py:15-24)."""
    return a * (1 - t) + b * t


def normalize_tensor(x: jnp.ndarray, axis: int = -1, return_norm: bool = False):
    """Normalize to unit norm along `axis` (reference: general.py:27-39).

    Unlike the torch version this never produces NaN: zero vectors map to
    zero vectors (the reference patches NaNs to zero after the fact, e.g.
    angular.py:147; we fold that in).
    """
    norm = _safe_norm(x, axis=axis)
    normalized = x / norm
    return (normalized, norm) if return_norm else normalized


def radian_to_degree(q):
    return q * (180.0 / jnp.pi)


def degree_to_radian(q):
    return q * (jnp.pi / 180.0)


def normalize_angle(q):
    """Normalize radians into [-pi, pi) (reference: angular.py:67-76)."""
    mod = jnp.mod(q, 2 * jnp.pi)
    return jnp.where(mod >= jnp.pi, mod - 2 * jnp.pi, mod)


def angle_difference(target, source):
    return normalize_angle(target - source)


def vector_cross_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric [v]x for each vector3 (reference: general.py:63-74)."""
    x = x.reshape(-1, 3)
    zeros = jnp.zeros_like(x[:, 0])
    return jnp.stack(
        (zeros, -x[:, 2], x[:, 1],
         x[:, 2], zeros, -x[:, 0],
         -x[:, 1], x[:, 0], zeros), axis=1).reshape(-1, 3, 3)


# ---------------------------------------------------------------------------
# Axis-angle
# ---------------------------------------------------------------------------

@f32_matmuls
def axis_angle_to_rotation_matrix(a: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula (reference: angular.py:139-151). [N,3] -> [N,3,3]."""
    a = jnp.asarray(a).reshape(-1, 3)
    angle = _safe_norm(a)
    axis = a / angle
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), (a.shape[0], 3, 3))
    outer = axis[:, :, None] * axis[:, None, :]
    return c * eye + (1 - c) * outer + s * vector_cross_matrix(axis)


def rotation_matrix_to_axis_angle(r: jnp.ndarray) -> jnp.ndarray:
    """Closed-form log map, [N,3,3] -> [N,3], angle in [0, pi].

    Replaces the reference's host-side `cv2.Rodrigues` loop
    (angular.py:154-164) with a branchless quaternion route that is robust
    at angle ~ 0 and ~ pi.
    """
    q = rotation_matrix_to_quaternion(r)
    return quaternion_to_axis_angle(q)


# ---------------------------------------------------------------------------
# Quaternion (wxyz)
# ---------------------------------------------------------------------------

def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(Unnormalized) quaternion wxyz -> rotation matrix (angular.py:224-236)."""
    q = normalize_tensor(jnp.asarray(q).reshape(-1, 4))
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack(
        (1 - 2 * (c * c + d * d), 2 * (b * c - a * d), 2 * (a * c + b * d),
         2 * (b * c + a * d), 1 - 2 * (b * b + d * d), 2 * (c * d - a * b),
         2 * (b * d - a * c), 2 * (a * b + c * d), 1 - 2 * (b * b + c * c)),
        axis=1)
    return r.reshape(-1, 3, 3)


def rotation_matrix_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion wxyz with w >= 0. Branchless Shepperd.

    Picks the numerically largest of the four candidate magnitudes so the
    conversion is stable for all rotations (including angle ~ pi where the
    naive trace formula fails).
    """
    r = jnp.asarray(r).reshape(-1, 3, 3)
    m00, m01, m02 = r[:, 0, 0], r[:, 0, 1], r[:, 0, 2]
    m10, m11, m12 = r[:, 1, 0], r[:, 1, 1], r[:, 1, 2]
    m20, m21, m22 = r[:, 2, 0], r[:, 2, 1], r[:, 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each valid when its pivot is largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    s_w = safe_sqrt(1.0 + tr)                  # 2w when tr dominant
    q_w = jnp.stack((0.5 * s_w, (m21 - m12) / (2 * s_w),
                     (m02 - m20) / (2 * s_w), (m10 - m01) / (2 * s_w)), -1)
    s_x = safe_sqrt(1.0 + m00 - m11 - m22)
    q_x = jnp.stack(((m21 - m12) / (2 * s_x), 0.5 * s_x,
                     (m01 + m10) / (2 * s_x), (m02 + m20) / (2 * s_x)), -1)
    s_y = safe_sqrt(1.0 - m00 + m11 - m22)
    q_y = jnp.stack(((m02 - m20) / (2 * s_y), (m01 + m10) / (2 * s_y),
                     0.5 * s_y, (m12 + m21) / (2 * s_y)), -1)
    s_z = safe_sqrt(1.0 - m00 - m11 + m22)
    q_z = jnp.stack(((m10 - m01) / (2 * s_z), (m02 + m20) / (2 * s_z),
                     (m12 + m21) / (2 * s_z), 0.5 * s_z), -1)

    # Pivot selection: tr vs diagonal entries.
    cond_tr = tr > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(cond_tr[:, None], q_w,
                  jnp.where(cond_x[:, None], q_x,
                            jnp.where(cond_y[:, None], q_y, q_z)))
    # Canonicalize to w >= 0 so axis-angle lands in [0, pi].
    q = jnp.where(q[:, :1] < 0, -q, q)
    return normalize_tensor(q)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion wxyz -> axis-angle (reference: angular.py:195-208)."""
    q = normalize_tensor(jnp.asarray(q).reshape(-1, 4))
    theta_half = jnp.arccos(jnp.clip(q[:, :1], -1.0, 1.0))
    sin_half = jnp.sin(theta_half)
    scale = jnp.where(jnp.abs(sin_half) < _EPS,
                      2.0,  # small-angle limit: a ~= 2*xyz
                      2.0 * theta_half / jnp.maximum(jnp.abs(sin_half), _EPS)
                      * jnp.sign(sin_half))
    return q[:, 1:] * scale


def axis_angle_to_quaternion(a: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> quaternion wxyz (reference: angular.py:211-221)."""
    a = jnp.asarray(a).reshape(-1, 3)
    angle = _safe_norm(a)
    axis = a / angle
    return jnp.concatenate((jnp.cos(angle / 2), jnp.sin(angle / 2) * axis), -1)


# ---------------------------------------------------------------------------
# 6D representation
# ---------------------------------------------------------------------------

def r6d_to_rotation_matrix(r6d: jnp.ndarray) -> jnp.ndarray:
    """6D -> rotation matrix by Gram-Schmidt (reference: angular.py:167-182).

    The 6D vector holds the first two *columns* of the matrix.
    """
    r6d = jnp.asarray(r6d).reshape(-1, 6)
    col0 = normalize_tensor(r6d[:, 0:3])
    col1 = r6d[:, 3:6] - jnp.sum(col0 * r6d[:, 3:6], axis=1, keepdims=True) * col0
    col1 = normalize_tensor(col1)
    col2 = jnp.cross(col0, col1)
    return jnp.stack((col0, col1, col2), axis=-1)


def rotation_matrix_to_r6d(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D: first two columns (reference: angular.py:185-192)."""
    r = jnp.asarray(r).reshape(-1, 3, 3)
    return jnp.swapaxes(r[:, :, :2], 1, 2).reshape(-1, 6)


# ---------------------------------------------------------------------------
# Euler angles (scipy convention: uppercase intrinsic, lowercase extrinsic)
# ---------------------------------------------------------------------------

_AXIS2IDX = {"x": 0, "y": 1, "z": 2}


def _elementary_rotation(axis: int, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(angle), jnp.ones_like(angle)
    if axis == 0:
        rows = (ones, zeros, zeros, zeros, c, -s, zeros, s, c)
    elif axis == 1:
        rows = (c, zeros, s, zeros, ones, zeros, -s, zeros, c)
    else:
        rows = (c, -s, zeros, s, c, zeros, zeros, zeros, ones)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


@f32_matmuls
def euler_angle_to_rotation_matrix(q: jnp.ndarray, seq: str = "XYZ") -> jnp.ndarray:
    """Euler angles -> rotation matrices (reference: angular.py:255-268).

    Intrinsic (uppercase): R = R_{s0}(a0) @ R_{s1}(a1) @ R_{s2}(a2).
    Extrinsic (lowercase): R = R_{s2}(a2) @ R_{s1}(a1) @ R_{s0}(a0).
    """
    q = jnp.asarray(q).reshape(-1, 3)
    axes = [_AXIS2IDX[ch.lower()] for ch in seq]
    mats = [_elementary_rotation(axes[i], q[:, i]) for i in range(3)]
    if seq.isupper():
        return mats[0] @ mats[1] @ mats[2]
    if seq.islower():
        return mats[2] @ mats[1] @ mats[0]
    raise ValueError(f"mixed intrinsic/extrinsic seq not supported: {seq}")


def _levi_civita(i: int, j: int, k: int) -> int:
    return 1 if (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)) else -1


def rotation_matrix_to_euler_angle(r: jnp.ndarray, seq: str = "XYZ") -> jnp.ndarray:
    """Rotation matrices -> euler angles (reference: angular.py:239-252).

    Supports all 12 sequences: Tait-Bryan (three distinct axes, e.g.
    'XYZ', second angle in [-pi/2, pi/2]) and proper Euler (repeated
    first/third axis, e.g. 'ZXZ', second angle in [0, pi]), intrinsic
    (uppercase) or extrinsic (lowercase). Gimbal-lock inputs are clipped
    (the third angle absorbs the ambiguity; exact behavior at the
    singularity is unspecified, like scipy's warning).
    """
    r = r.reshape(-1, 3, 3)
    if seq.islower():
        inner = rotation_matrix_to_euler_angle(r, seq[::-1].upper())
        return inner[:, ::-1]
    if not seq.isupper():
        raise ValueError(f"mixed intrinsic/extrinsic seq not supported: {seq}")
    i, j, k = (_AXIS2IDX[ch.lower()] for ch in seq)
    if len({i, j, k}) == 3:                       # Tait-Bryan
        eps = _levi_civita(i, j, k)
        b = jnp.arcsin(jnp.clip(eps * r[:, i, k], -1.0, 1.0))
        a = jnp.arctan2(-eps * r[:, j, k], r[:, k, k])
        c = jnp.arctan2(-eps * r[:, i, j], r[:, i, i])
        return jnp.stack((a, b, c), axis=-1)
    if i == k and i != j:                         # proper Euler (i-j-i)
        # R = R_i(a) R_j(b) R_i(c); with m the axis absent from the
        # sequence and eps = levi_civita(i, j, m):
        #   R[i,i] = cos b
        #   R[j,i] = sin a sin b,  R[m,i] = -eps cos a sin b
        #   R[i,j] = sin b sin c,  R[i,m] =  eps sin b cos c
        m = 3 - i - j
        eps = _levi_civita(i, j, m)
        b = jnp.arccos(jnp.clip(r[:, i, i], -1.0, 1.0))
        a = jnp.arctan2(r[:, j, i], -eps * r[:, m, i])
        c = jnp.arctan2(r[:, i, j], eps * r[:, i, m])
        return jnp.stack((a, b, c), axis=-1)
    raise ValueError(f"invalid euler sequence (adjacent repeated axis): "
                     f"{seq}")


# ---------------------------------------------------------------------------
# Comparisons / misc
# ---------------------------------------------------------------------------

def to_rotation_matrix(r: jnp.ndarray, rep: RotationRepresentation) -> jnp.ndarray:
    """Convert any representation to [N,3,3] (reference: angular.py:31-50)."""
    if rep == RotationRepresentation.AXIS_ANGLE:
        return axis_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.QUATERNION:
        return quaternion_to_rotation_matrix(r)
    if rep == RotationRepresentation.R6D:
        return r6d_to_rotation_matrix(r)
    if rep == RotationRepresentation.EULER_ANGLE:
        return euler_angle_to_rotation_matrix(r)
    if rep == RotationRepresentation.ROTATION_MATRIX:
        return r.reshape(-1, 3, 3)
    raise ValueError("unknown rotation representation")


@f32_matmuls
def angle_between(rot1: jnp.ndarray, rot2: jnp.ndarray,
                  rep: RotationRepresentation = RotationRepresentation.ROTATION_MATRIX) -> jnp.ndarray:
    """Angle in radians between two rotation batches (angular.py:86-99)."""
    r1 = to_rotation_matrix(rot1, rep)
    r2 = to_rotation_matrix(rot2, rep)
    offsets = jnp.swapaxes(r1, -1, -2) @ r2
    return jnp.linalg.norm(rotation_matrix_to_axis_angle(offsets), axis=-1)


@f32_matmuls
def svd_rotate(source_points: jnp.ndarray, target_points: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation from source to target point sets (angular.py:102-118)."""
    source_points = jnp.asarray(source_points)
    target_points = jnp.asarray(target_points)
    m = jnp.swapaxes(source_points, -1, -2) @ target_points
    u, _, vt = jnp.linalg.svd(m)
    v = jnp.swapaxes(vt, -1, -2)
    vut = v @ jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(vut)
    # Reflections: flip the last column of v.
    v_fixed = v.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return v_fixed @ jnp.swapaxes(u, -1, -2)


def generate_random_rotation_matrix(key: jax.Array, n: int = 1) -> jnp.ndarray:
    """Uniform random rotations via normalized Gaussian quats (angular.py:121-136)."""
    q = jax.random.normal(key, (n, 4))
    return quaternion_to_rotation_matrix(q)
