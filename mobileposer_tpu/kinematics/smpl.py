"""SMPL parametric body model on TPU (jax.numpy).

Functional parity target: reference `mobileposer/articulate/model.py`
(`ParametricModel`). Parameters are loaded once on host (pickle / npz) and
held as jnp constants; forward kinematics uses the level-parallel tree of
`spatial.py` and linear-blend skinning is a single einsum over the skinning
weights (reference does the same via tensordot, model.py:234-239).

Because the official SMPL pickle is a large binary not shipped with the
repo, `ParametricModel.synthetic()` builds a deterministic SMPL-shaped
fixture (same array shapes, plausible T-pose skeleton) for tests and
benchmarks; real-file loading goes through the same interface.
"""

from __future__ import annotations

import enum
import os
import pickle
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics import spatial as S
from mobileposer_tpu.utils.precision import f32_matmuls

# Standard SMPL kinematic tree (public model constant).
SMPL_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21)

NUM_JOINTS = 24
NUM_VERTICES = 6890  # reference: constants.py:33


class SMPLJoint(enum.IntEnum):
    """Named SMPL joint indices (standard model convention; reference
    surface: articulate/armature.py:35-64 — used there only as the
    `align_joint` vocabulary of the evaluator). L/R prefixes are
    left/right; aliases share an index like the standard armature."""
    ROOT = 0
    PELVIS = 0
    SPINE = 0  # reference armature aliases SPINE to the root as well
    LHIP = 1
    RHIP = 2
    SPINE1 = 3
    LKNEE = 4
    RKNEE = 5
    SPINE2 = 6
    LANKLE = 7
    RANKLE = 8
    SPINE3 = 9
    LFOOT = 10
    RFOOT = 11
    NECK = 12
    LCLAVICLE = 13
    RCLAVICLE = 14
    HEAD = 15
    LSHOULDER = 16
    RSHOULDER = 17
    LELBOW = 18
    RELBOW = 19
    LWRIST = 20
    RWRIST = 21
    LHAND = 22
    RHAND = 23


class _ChumpyShim:
    """Stand-in for chumpy array classes inside official SMPL pickles.

    The official basicmodel .pkl stores some fields as chumpy Ch objects;
    unpickling them normally imports chumpy, which is not a dependency
    here. Pickle restores instance state via __setstate__/__dict__, so a
    plain object shim captures it; `_to_np` then digs out the underlying
    numpy array (chumpy keeps it in the 'x' attribute).
    """


def _install_chumpy_shim() -> None:
    import sys
    import types
    if "chumpy" in sys.modules:
        return
    mod = types.ModuleType("chumpy")

    class _Finder:
        def find_module(self, name, path=None):  # pragma: no cover - py<3.12
            return None

    def _getattr(name):
        # Tools that introspect sys.modules (inspect, importlib, torch's
        # import machinery) probe __file__/__spec__/__path__ on every
        # module; answering those with a class crashes them. Only
        # pickle-restored chumpy class names get the shim.
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _ChumpyShim

    mod.__getattr__ = _getattr
    mod.Ch = _ChumpyShim
    sys.modules["chumpy"] = mod
    for sub in ("ch", "ch_ops", "reordering"):
        sm = types.ModuleType(f"chumpy.{sub}")
        sm.__getattr__ = _getattr
        sys.modules[f"chumpy.{sub}"] = sm


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):        # scipy sparse
        return np.asarray(x.toarray())
    if isinstance(x, _ChumpyShim) or type(x).__name__ == "Ch":
        inner = getattr(x, "x", None)
        if inner is None:
            inner = x.__dict__.get("x")
        if inner is None:
            raise ValueError("cannot extract array from chumpy object "
                             f"(attrs: {list(getattr(x, '__dict__', {}))})")
        return _to_np(inner)
    return np.asarray(x)


def load_smpl_arrays(model_file: str) -> dict:
    """Host-side load of the official SMPL pickle into plain numpy arrays.

    Mirrors the fields read by the reference ctor (model.py:28-39).
    Official pickles reference chumpy; a shim captures those objects and
    extracts their numpy payloads, so chumpy itself is not required.
    """
    try:
        with open(model_file, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    except ModuleNotFoundError as e:
        if "chumpy" not in str(e):
            raise
        _install_chumpy_shim()
        with open(model_file, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    return dict(
        J_regressor=_to_np(data["J_regressor"]).astype(np.float32),
        weights=_to_np(data["weights"]).astype(np.float32),
        posedirs=_to_np(data["posedirs"]).astype(np.float32),
        shapedirs=_to_np(data["shapedirs"]).astype(np.float32),
        v_template=_to_np(data["v_template"]).astype(np.float32),
        J=_to_np(data["J"]).astype(np.float32),
        f=_to_np(data["f"]).astype(np.int32),
        parents=tuple([-1] + [int(p) for p in
                              _to_np(data["kintree_table"])[0][1:].tolist()]),
    )


def synthetic_smpl_arrays(num_vertices: int = NUM_VERTICES, seed: int = 0) -> dict:
    """Deterministic SMPL-shaped fixture for tests (no official blob needed).

    Joints form a plausible T-pose skeleton (so feet indices 10/11 really are
    lowest, matching the floor logic in the reference net.py:49); vertices
    cluster around their dominant joint with soft skinning to the parent.
    """
    if num_vertices < NUM_JOINTS:
        raise ValueError(f"synthetic body needs >= {NUM_JOINTS} vertices "
                         f"(one per joint for the regressor), got "
                         f"{num_vertices}")
    rng = np.random.RandomState(seed)
    # Rough T-pose joint positions (y-up, meters): pelvis at origin.
    J = np.array([
        [0.00, 0.00, 0.00],    # 0 pelvis
        [0.08, -0.08, 0.00],   # 1 L hip
        [-0.08, -0.08, 0.00],  # 2 R hip
        [0.00, 0.10, 0.00],    # 3 spine1
        [0.10, -0.50, 0.00],   # 4 L knee
        [-0.10, -0.50, 0.00],  # 5 R knee
        [0.00, 0.22, 0.00],    # 6 spine2
        [0.09, -0.90, -0.02],  # 7 L ankle
        [-0.09, -0.90, -0.02], # 8 R ankle
        [0.00, 0.32, 0.00],    # 9 spine3
        [0.10, -0.95, 0.10],   # 10 L foot
        [-0.10, -0.95, 0.10],  # 11 R foot
        [0.00, 0.50, 0.00],    # 12 neck
        [0.08, 0.42, 0.00],    # 13 L collar
        [-0.08, 0.42, 0.00],   # 14 R collar
        [0.00, 0.60, 0.02],    # 15 head
        [0.17, 0.44, 0.00],    # 16 L shoulder
        [-0.17, 0.44, 0.00],   # 17 R shoulder
        [0.42, 0.44, 0.00],    # 18 L elbow
        [-0.42, 0.44, 0.00],   # 19 R elbow
        [0.67, 0.44, 0.00],    # 20 L wrist
        [-0.67, 0.44, 0.00],   # 21 R wrist
        [0.75, 0.44, 0.00],    # 22 L hand
        [-0.75, 0.44, 0.00],   # 23 R hand
    ], dtype=np.float32)

    # Assign vertices round-robin to joints, offset by small noise.
    owner = np.arange(num_vertices) % NUM_JOINTS
    v_template = J[owner] + rng.uniform(-0.05, 0.05, (num_vertices, 3)).astype(np.float32)

    # Skinning: 0.8 to owner joint, 0.2 to its parent (root: all to root).
    weights = np.zeros((num_vertices, NUM_JOINTS), np.float32)
    weights[np.arange(num_vertices), owner] = 0.8
    parent_of_owner = np.array([max(SMPL_PARENTS[j], 0) for j in owner])
    weights[np.arange(num_vertices), parent_of_owner] += 0.2

    # J_regressor: average of the vertices owned by each joint.
    J_regressor = np.zeros((NUM_JOINTS, num_vertices), np.float32)
    for j in range(NUM_JOINTS):
        idx = np.nonzero(owner == j)[0]
        J_regressor[j, idx] = 1.0 / len(idx)
    # Re-derive J so that J == J_regressor @ v_template exactly.
    J = (J_regressor @ v_template).astype(np.float32)

    shapedirs = rng.uniform(-0.01, 0.01, (num_vertices, 3, 10)).astype(np.float32)
    posedirs = np.zeros((num_vertices, 3, 23 * 9), np.float32)
    faces = np.stack([np.arange(num_vertices - 2),
                      np.arange(1, num_vertices - 1),
                      np.arange(2, num_vertices)], axis=1).astype(np.int32)
    return dict(J_regressor=J_regressor, weights=weights, posedirs=posedirs,
                shapedirs=shapedirs, v_template=v_template, J=J, f=faces,
                parents=SMPL_PARENTS)


class ParametricModel:
    """SMPL body model with TPU-resident parameters (reference: model.py:16)."""

    def __init__(self, model_data, use_pose_blendshape: bool = False,
                 dtype=jnp.float32):
        if isinstance(model_data, (str, os.PathLike)):
            model_data = load_smpl_arrays(str(model_data))
        # Parameters live host-side as numpy: under jit they constant-fold
        # into the compiled program (no HBM round-trips at trace time), and
        # eager construction never dispatches device ops — important when
        # the device is reached through a high-latency tunnel.
        np_dtype = np.dtype(str(jnp.dtype(dtype)))
        self._J_regressor = np.asarray(model_data["J_regressor"], np_dtype)
        self._skinning_weights = np.asarray(model_data["weights"], np_dtype)
        self._posedirs = np.asarray(model_data["posedirs"], np_dtype)
        self._shapedirs = np.asarray(model_data["shapedirs"], np_dtype)
        self._v_template = np.asarray(model_data["v_template"], np_dtype)
        self._J = np.asarray(model_data["J"], np_dtype)
        self.face = np.asarray(model_data["f"])
        self.parent = S._canon_parent(model_data["parents"])
        self.use_pose_blendshape = use_pose_blendshape
        self.num_joints = self._J.shape[0]
        self.num_vertices = self._v_template.shape[0]

    # -- constructors -----------------------------------------------------
    @classmethod
    def synthetic(cls, num_vertices: int = NUM_VERTICES, seed: int = 0,
                  **kw) -> "ParametricModel":
        return cls(synthetic_smpl_arrays(num_vertices, seed), **kw)

    @classmethod
    def from_file_or_synthetic(cls, model_file, **kw) -> "ParametricModel":
        """Load the official file if present, else the deterministic fixture."""
        if model_file is not None and os.path.exists(str(model_file)):
            return cls(str(model_file), **kw)
        return cls.synthetic(**kw)

    # -- zero pose ---------------------------------------------------------
    @f32_matmuls
    def get_zero_pose_joint_and_vertex(self, shape: Optional[jnp.ndarray] = None):
        """Zero-pose joints/vertices, root at origin (reference: model.py:77-92).

        With shape=None this is pure numpy (host-side, free of device
        dispatch); with a shape vector it traces as jnp.
        """
        if shape is None:
            j = self._J - self._J[:1]
            v = self._v_template - self._J[:1]
            return j, v
        shape = shape.reshape(-1, 10)
        v = jnp.tensordot(shape, self._shapedirs, axes=([1], [2])) + self._v_template
        j = jnp.einsum("jv,nvc->njc", self._J_regressor, v)
        return j - j[:, :1], v - j[:, :1]

    # -- tree wrappers -------------------------------------------------
    def bone_vector_to_joint_position(self, bone_vec):
        return S.bone_vector_to_joint_position(bone_vec, self.parent)

    def joint_position_to_bone_vector(self, joint_pos):
        return S.joint_position_to_bone_vector(joint_pos, self.parent)

    def forward_kinematics_R(self, R_local):
        return S.forward_kinematics_R(R_local, self.parent)

    def inverse_kinematics_R(self, R_global):
        return S.inverse_kinematics_R(R_global, self.parent)

    def forward_kinematics_T(self, T_local):
        return S.forward_kinematics_T(T_local, self.parent)

    def joint_positions_from_global(self, R_global):
        """Positions from global rotations (fast position-only FK).

        Precomputes the zero-pose bone vectors once per body.
        """
        if not hasattr(self, "_bone_vec_np"):
            j = self._J - self._J[:1]
            par = np.array([0 if p < 0 else p for p in self.parent])
            bone = j - j[par]
            bone[0] = j[0]
            self._bone_vec_np = bone.astype(self._J.dtype)
        return S.joint_positions_from_global(R_global, self._bone_vec_np,
                                             self.parent)

    def inverse_kinematics_T(self, T_global):
        return S.inverse_kinematics_T(T_global, self.parent)

    # -- main FK ------------------------------------------------------
    @f32_matmuls
    def forward_kinematics(self, pose: jnp.ndarray,
                           shape: Optional[jnp.ndarray] = None,
                           tran: Optional[jnp.ndarray] = None,
                           calc_mesh: bool = False):
        """Global rotations, joint positions, optionally LBS mesh vertices.

        Reference: model.py:208-240. `calc_mesh` must be a static Python
        bool (it changes the number of outputs).
        """
        pose = jnp.asarray(pose).reshape(pose.shape[0], -1, 3, 3)
        n = pose.shape[0]
        j, v = self.get_zero_pose_joint_and_vertex(shape)
        if j.ndim == 2:
            j = jnp.broadcast_to(j, (n,) + j.shape)
            v = jnp.broadcast_to(v, (n,) + v.shape)
        elif j.shape[0] == 1 and n > 1:
            # one shape vector shared by the whole pose batch
            j = jnp.broadcast_to(j, (n,) + j.shape[1:])
            v = jnp.broadcast_to(v, (n,) + v.shape[1:])
        bone_vec = self.joint_position_to_bone_vector(j)
        pose_global, joint_global = S.forward_kinematics(pose, bone_vec, self.parent)

        def add_tran(x):
            return x if tran is None else x + tran.reshape(-1, 1, 3)

        if not calc_mesh:
            return pose_global, add_tran(joint_global)

        # LBS: per-joint global transform with the zero-pose joint subtracted
        # (T_global[..., 3] -= T_global @ [j, 0]), then blend per vertex.
        # p_adj = p_global - R_global @ j   (reference: model.py:234)
        p_adj = joint_global - (pose_global @ j[..., None])[..., 0]
        if self.use_pose_blendshape:
            eye = jnp.eye(3, dtype=pose.dtype)
            r = (pose[:, 1:] - eye).reshape(n, -1)
            v = v + jnp.tensordot(r, self._posedirs, axes=([1], [2]))
        # Blend rotations and translations separately — equivalent to
        # blending 4x4 transforms but avoids materializing [N,V,4,4].
        # R_v = sum_j w[v,j] R_global[n,j]; t_v = sum_j w[v,j] p_adj[n,j]
        W = self._skinning_weights  # [V, J]
        R_v = jnp.einsum("vj,njab->nvab", W, pose_global)
        t_v = jnp.einsum("vj,njc->nvc", W, p_adj)
        vertex_global = (R_v @ v[..., None])[..., 0] + t_v
        return pose_global, add_tran(joint_global), add_tran(vertex_global)

    # -- host-side export (reference: model.py:41-75) ----------------------
    def save_obj_mesh(self, vertex_position, file_name="a.obj"):
        verts = np.asarray(vertex_position)
        with open(file_name, "w") as fp:
            for v in verts:
                fp.write("v %f %f %f\n" % (v[0], v[1], v[2]))
            for f in self.face + 1:
                fp.write("f %d %d %d\n" % (f[0], f[1], f[2]))

    @staticmethod
    def save_unity_motion(pose=None, tran=None, output_dir="saved_motions/"):
        os.makedirs(output_dir, exist_ok=True)
        if pose is not None:
            pose = np.asarray(R.rotation_matrix_to_axis_angle(
                jnp.asarray(pose))).reshape(np.asarray(pose).shape[0], -1)
            with open(os.path.join(output_dir, "pose.txt"), "w") as f:
                f.write("\n".join(
                    ",".join("%.4f" % x for x in p) for p in pose))
        if tran is not None:
            tran = np.asarray(tran).reshape(-1, 3)
            with open(os.path.join(output_dir, "tran.txt"), "w") as f:
                f.write("\n".join(
                    ",".join("%.5f" % x for x in t) for t in tran))
