"""Offline skeleton renderer for MotionDump bundles.

Behavioral parity target: the reference's live prediction-vs-GT render
(`viewers/smpl_viewer.py:23-43`, `visualizer.py:96-245`, open3d/pygame).
TPU hosts are headless, so the equivalent is an offline renderer: it takes
the `.npz` bundle `SMPLViewer.view` writes (pose_p/tran_p and optionally
pose_t/tran_t, GT already offset on +x like the reference's side-by-side
view) and produces PNG frames or an animated GIF of the two skeletons —
no GL, matplotlib only.

    python -m mobileposer_tpu.cli.render saved_motions/view.npz \
        --out render_out [--stride 5] [--gif]
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics.smpl import SMPL_PARENTS, ParametricModel

_BONES = [(j, int(SMPL_PARENTS[j])) for j in range(1, 24)]


def joints_from_pose(body: ParametricModel, pose: np.ndarray,
                     tran: Optional[np.ndarray] = None) -> np.ndarray:
    """FK a [N, 24, 3, 3] local-pose sequence to [N, 24, 3] joints."""
    pose = jnp.asarray(pose).reshape(-1, 24, 3, 3)
    t = (jnp.asarray(tran).reshape(-1, 3) if tran is not None
         else jnp.zeros((pose.shape[0], 3), pose.dtype))
    _, joints = jax.jit(body.forward_kinematics)(pose, tran=t)
    return np.asarray(joints).reshape(-1, 24, 3)


def _plot_skeleton(ax, joints: np.ndarray, color: str, label: str) -> None:
    for j, p in _BONES:
        ax.plot([joints[p, 0], joints[j, 0]],
                [joints[p, 2], joints[j, 2]],
                [joints[p, 1], joints[j, 1]], c=color, lw=2)
    ax.scatter(joints[:, 0], joints[:, 2], joints[:, 1], c=color, s=8,
               label=label)


def load_bundle_joints(bundle, body: Optional[ParametricModel] = None):
    """(bundle_dict, joints_p [N,24,3], joints_t or None) from a MotionDump
    npz bundle (path or dict) — the one loader shared by the offline
    renderer and `cli/render --live`. Bundle translations already carry the
    viewer's world-space GT offset (viz/viewer.py:94), so callers must not
    offset again."""
    if not isinstance(bundle, dict):
        bundle = dict(np.load(bundle))
    body = body or ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    joints_p = joints_from_pose(body, bundle["pose_p"], bundle.get("tran_p"))
    joints_t = (joints_from_pose(body, bundle["pose_t"],
                                 bundle.get("tran_t"))
                if "pose_t" in bundle else None)
    return bundle, joints_p, joints_t


def render_motion(bundle, out_dir, body: Optional[ParametricModel] = None,
                  stride: int = 5, gif: bool = False,
                  dpi: int = 80) -> Path:
    """Render a MotionDump npz bundle (path or dict of arrays) to PNG
    frames (and optionally an animated GIF). Returns the output dir (or
    the gif path)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bundle, joints_p, joints_t = load_bundle_joints(bundle, body)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    allj = (np.concatenate([joints_p, joints_t])
            if joints_t is not None else joints_p)
    lo, hi = allj.min(axis=(0, 1)), allj.max(axis=(0, 1))
    mid, span = (lo + hi) / 2, float((hi - lo).max() / 2 + 0.1)

    idxs = range(0, joints_p.shape[0], max(1, stride))
    frames = []
    for i in idxs:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
        _plot_skeleton(ax, joints_p[i], "tab:blue", "prediction")
        if joints_t is not None:
            _plot_skeleton(ax, joints_t[i], "tab:green", "ground truth")
        ax.set_xlim(mid[0] - span, mid[0] + span)
        ax.set_ylim(mid[2] - span, mid[2] + span)
        ax.set_zlim(mid[1] - span, mid[1] + span)
        ax.set_title(f"frame {i}")
        ax.legend(loc="upper right")
        path = out_dir / f"frame_{i:05d}.png"
        fig.savefig(path, dpi=dpi)
        frames.append(path)
        plt.close(fig)

    if gif:
        from PIL import Image
        imgs = [Image.open(p) for p in frames]
        gif_path = out_dir / "motion.gif"
        imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                     duration=max(1, int(1000 * stride / C.datasets.fps)),
                     loop=0)
        return gif_path
    return out_dir
