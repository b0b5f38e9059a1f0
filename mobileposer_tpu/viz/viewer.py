"""Visualization / debug layer (headless-first).

Behavioral parity target: reference `example.py` + `viewer.py` +
`viewers/smpl_viewer.py` + `loader.py`. The reference renders with
open3d/vctoolkit/pygame; on a headless TPU host the equivalents are:

  * `MotionDump` — per-frame OBJ meshes / Unity pose+tran text / one .npz
    bundle, consumable by any external viewer (Blender, Unity, open3d on a
    workstation)
  * `SMPLViewer.view` — same dual-body (prediction vs GT) semantics as the
    reference viewer (smpl_viewer.py:23-43): GT body offset on +x, optional
    GT-translation mode via the `gt` flags
  * `SequenceLoader` — the viz-time data loader (reference loader.py:9-68):
    loads a processed or recorded sequence and runs the model offline or
    frame-by-frame
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.models import MobilePoserNet


class MotionDump:
    """Write predicted motion to viewer-consumable files."""

    def __init__(self, body_model: ParametricModel, out_dir="saved_motions"):
        self.body = body_model
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def save_npz(self, name: str, **arrays) -> Path:
        path = self.out_dir / f"{name}.npz"
        np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
        return path

    def save_unity(self, pose, tran) -> None:
        self.body.save_unity_motion(np.asarray(pose), np.asarray(tran),
                                    output_dir=str(self.out_dir))

    def save_obj_sequence(self, pose, tran=None, stride: int = 10,
                          prefix: str = "frame") -> int:
        """Export every `stride`-th frame as an OBJ mesh."""
        pose = jnp.asarray(pose).reshape(-1, 24, 3, 3)
        n = pose.shape[0]
        fk = jax.jit(lambda p, t: self.body.forward_kinematics(
            p, tran=t, calc_mesh=True)[2])
        count = 0
        for i in range(0, n, stride):
            t = (jnp.asarray(tran[i:i + 1]) if tran is not None
                 else jnp.zeros((1, 3)))
            verts = np.asarray(fk(pose[i:i + 1], t))[0]
            self.body.save_obj_mesh(verts,
                                    str(self.out_dir / f"{prefix}_{i:05d}.obj"))
            count += 1
        return count


class SMPLViewer:
    """Dual-body prediction-vs-GT export (reference: smpl_viewer.py:23-43).

    The GT body is offset by +x like the reference's side-by-side render;
    with `gt_tran` the prediction uses the ground-truth translation
    (the reference's GT=1/2 modes)."""

    def __init__(self, body_model: Optional[ParametricModel] = None,
                 out_dir="saved_motions"):
        self.body = body_model or ParametricModel.from_file_or_synthetic(
            C.paths.smpl_file)
        self.dump = MotionDump(self.body, out_dir)

    def view(self, pose_p, tran_p, pose_t=None, tran_t=None,
             gt_tran: bool = False, offset_x: float = 1.0,
             name: str = "view") -> Path:
        pose_p = np.asarray(pose_p).reshape(-1, 24, 3, 3)
        tran_p = np.asarray(tran_p).reshape(-1, 3)
        if gt_tran and tran_t is not None:
            tran_p = np.asarray(tran_t).reshape(-1, 3)
        arrays = {"pose_p": pose_p, "tran_p": tran_p}
        if pose_t is not None:
            arrays["pose_t"] = np.asarray(pose_t).reshape(-1, 24, 3, 3)
            t = (np.asarray(tran_t).reshape(-1, 3) if tran_t is not None
                 else np.zeros_like(tran_p))
            arrays["tran_t"] = t + np.array([offset_x, 0.0, 0.0])
        self.dump.save_unity(pose_p, tran_p)
        return self.dump.save_npz(name, **arrays)


class SequenceLoader:
    """Viz-time model runner (reference: loader.py:9-68)."""

    def __init__(self, net: MobilePoserNet, params: dict, combo: str = "lw_rp"):
        self.net = net
        self.params = params
        self.combo = combo
        self._offline = jax.jit(net.forward_offline)
        self._online = jax.jit(net.forward_online)

    def run_offline(self, imu: np.ndarray):
        pose, joints, tran, contact = self._offline(
            self.params, jnp.asarray(imu))
        return (np.asarray(pose), np.asarray(joints), np.asarray(tran),
                np.asarray(contact))

    def run_online(self, imu: np.ndarray):
        state = self.net.init_online_state()
        poses, trans = [], []
        for frame in np.asarray(imu):
            (p, j, t, c), state = self._online(self.params, state,
                                               jnp.asarray(frame))
            poses.append(np.asarray(p))
            trans.append(np.asarray(t))
        return np.stack(poses), np.stack(trans)
