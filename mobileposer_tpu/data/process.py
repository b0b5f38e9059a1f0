"""Offline dataset synthesis: AMASS / DIP-IMU / TotalCapture / IMUPoser.

Behavioral parity target: reference `mobileposer/process.py:37-341`. Host
code does only file IO and sequence bookkeeping; all math (FK + LBS,
virtual-IMU synthesis, alignment, NaN fill, bias removal) runs jit-compiled
on device through `data/synthesis.py` in fixed-size chunks — the reference
runs everything eagerly on CPU with per-frame Python loops.

Outputs use the reference's processed `.pt` schema (process.py:113-121) via
torch.save so the two pipelines are file-compatible in both directions.
"""

from __future__ import annotations

import glob
import os
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.data import synthesis as S
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics.smpl import ParametricModel

TARGET_FPS = C.datasets.fps

_FK_MESH_CHUNK = 256


def _fk_mesh_chunked(body: ParametricModel, pose: np.ndarray,
                     shape: Optional[np.ndarray], tran: Optional[np.ndarray]):
    """Chunked FK + LBS over a whole sequence; one compile per chunk shape.

    The jitted programs are cached ON the body instance (fresh jit wrappers
    per sequence would recompile the ~90 s 6890-vertex program for every
    sequence); the shape vector is a traced argument, not a baked constant.
    """
    attr = "_fk_mesh_shape_jit" if shape is not None else "_fk_mesh_jit"
    fk_cached = getattr(body, attr, None)
    if fk_cached is None:
        if shape is None:
            fk_cached = jax.jit(lambda p, t: body.forward_kinematics(
                p, shape=None, tran=t, calc_mesh=True))
        else:
            fk_cached = jax.jit(lambda p, t, s: body.forward_kinematics(
                p, shape=s, tran=t, calc_mesh=True))
        setattr(body, attr, fk_cached)
    if shape is None:
        fk = fk_cached
    else:
        s_arr = jnp.asarray(shape)
        fk = lambda p, t: fk_cached(p, t, s_arr)
    n = pose.shape[0]
    grots, joints, verts = [], [], []
    for i in range(0, n, _FK_MESH_CHUNK):
        p = pose[i:i + _FK_MESH_CHUNK]
        t = (tran[i:i + _FK_MESH_CHUNK] if tran is not None
             else np.zeros((p.shape[0], 3), np.float32))
        pad = _FK_MESH_CHUNK - p.shape[0]
        if pad:
            p = np.concatenate([p, np.tile(np.eye(3, dtype=np.float32),
                                           (pad, 24, 1, 1))])
            t = np.concatenate([t, np.zeros((pad, 3), np.float32)])
        g, j, v = fk(jnp.asarray(p), jnp.asarray(t))
        g, j, v = np.asarray(g), np.asarray(j), np.asarray(v)
        if pad:
            g, j, v = g[:-pad], j[:-pad], v[:-pad]
        grots.append(g); joints.append(j); verts.append(v)
    return np.concatenate(grots), np.concatenate(joints), np.concatenate(verts)


def _synthesize(body: ParametricModel, pose_rot: np.ndarray,
                shape: Optional[np.ndarray], tran: Optional[np.ndarray]):
    """FK + virtual IMU channels for one sequence (process.py:102-121)."""
    grot, joint, vert = _fk_mesh_chunked(body, pose_rot, shape, tran)
    vi = S.tracked_vertex_indices(body.num_vertices)
    vacc = np.asarray(S.synthesize_acceleration(jnp.asarray(vert[:, vi])))
    contact = np.asarray(S.foot_ground_probs(jnp.asarray(joint)))
    return joint, grot[:, S.JI_MASK], vacc, contact


def _save_pt(data: Dict[str, list], path: Path) -> Path:
    import torch
    path.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: [torch.from_numpy(np.ascontiguousarray(x)) for x in v]
                for k, v in data.items()}, path)
    return path


def process_amass(body: Optional[ParametricModel] = None,
                  amass_datasets: Optional[List[str]] = None,
                  raw_dir=None, out_dir=None) -> List[Path]:
    """AMASS -> synthetic-IMU training data (reference: process.py:37-127)."""
    body = body or ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    raw_dir = Path(raw_dir or C.paths.raw_amass)
    out_dir = Path(out_dir or C.paths.processed_datasets)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for ds_name in (amass_datasets or C.datasets.amass_datasets):
        out_path = out_dir / f"{ds_name}.pt"
        if out_path.exists():
            continue
        seq_pose, seq_tran, seq_shape = [], [], []
        for npz_fname in sorted(glob.glob(
                str(raw_dir / ds_name / "*/*_poses.npz"))):
            try:
                cdata = np.load(npz_fname)
            except Exception:
                continue
            framerate = int(cdata["mocap_framerate"])
            if framerate not in (120, 60, 59):
                continue
            step = S.downsample_step(framerate)
            pose = cdata["poses"][::step].astype(np.float32).reshape(-1, 52, 3)
            # merge the right index finger into joint 23, keep body joints
            # (process.py:89-91)
            pose[:, 23] = pose[:, 37]
            pose = pose[:, :24]
            seq_pose.append(pose)
            seq_tran.append(cdata["trans"][::step].astype(np.float32))
            seq_shape.append(cdata["betas"][:10].astype(np.float32))
        if not seq_pose:
            print(f"AMASS dataset {ds_name}: no usable sequences")
            continue
        out = {k: [] for k in ("joint", "pose", "shape", "tran", "acc",
                               "ori", "contact")}
        for pose_aa, tran, shape in zip(seq_pose, seq_tran, seq_shape):
            if pose_aa.shape[0] <= 12:
                continue
            aligned_aa, tran_al = S.align_amass_to_dip(
                jnp.asarray(pose_aa), jnp.asarray(tran))
            p = np.asarray(R.axis_angle_to_rotation_matrix(
                aligned_aa.reshape(-1, 3))).reshape(-1, 24, 3, 3)
            tran_al = np.asarray(tran_al)
            joint, vrot, vacc, contact = _synthesize(body, p, shape, tran_al)
            out["pose"].append(p)
            out["tran"].append(tran_al)
            out["shape"].append(shape)
            out["joint"].append(joint)
            out["acc"].append(vacc)
            out["ori"].append(vrot)
            out["contact"].append(contact)
        written.append(_save_pt(out, out_path))
        print(f"Synthetic AMASS dataset saved: {out_path}")
    return written


def process_dipimu(split: str = "test", body: Optional[ParametricModel] = None,
                   raw_dir=None, out_dir=None) -> Path:
    """DIP-IMU -> finetune/eval data (reference: process.py:227-295)."""
    body = body or ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    raw_dir = Path(raw_dir or C.paths.raw_dip)
    out_dir = Path(out_dir or C.paths.eval_dir)
    imu_mask = [7, 8, 9, 10, 0, 2]
    subjects = (["s_09", "s_10"] if split == "test" else
                [f"s_{i:02d}" for i in range(1, 9)])
    step = S.downsample_step(60)
    out = {k: [] for k in ("joint", "pose", "shape", "tran", "acc", "ori")}
    for subject in subjects:
        sdir = raw_dir / subject
        if not sdir.exists():
            continue
        for motion in sorted(os.listdir(sdir)):
            path = sdir / motion
            try:
                with open(path, "rb") as f:
                    data = pickle.load(f, encoding="latin1")
                acc = np.asarray(data["imu_acc"], np.float32)[:, imu_mask]
                ori = np.asarray(data["imu_ori"], np.float32)[:, imu_mask]
                pose_aa = np.asarray(data["gt"], np.float32)
            except Exception as e:
                print(f"Error processing {path}: {e}")
                continue
            acc = np.asarray(S.nan_fill_nearest(jnp.asarray(acc)))
            ori = np.asarray(S.nan_fill_nearest(jnp.asarray(ori)))
            acc = acc[6:-6:step]
            ori = ori[6:-6:step]
            pose_aa = pose_aa[6:-6:step]
            if (np.isnan(acc).any() or np.isnan(ori).any()
                    or np.isnan(pose_aa).any()):
                print(f"DIP-IMU {subject}/{motion}: too many NaNs, discarded")
                continue
            shape = np.ones(10, np.float32)
            tran = np.zeros((pose_aa.shape[0], 3), np.float32)
            p = np.asarray(R.axis_angle_to_rotation_matrix(
                jnp.asarray(pose_aa.reshape(-1, 3)))).reshape(-1, 24, 3, 3)
            _, joint, _ = _fk_mesh_chunked(body, p, shape, tran)
            out["acc"].append(acc)
            out["ori"].append(ori)
            out["pose"].append(p)
            out["tran"].append(tran)
            out["shape"].append(shape)
            out["joint"].append(joint)
    path = out_dir / f"dip_{split}.pt"
    _save_pt(out, path)
    print(f"Preprocessed DIP-IMU saved: {path}")
    return path


def process_totalcapture(body: Optional[ParametricModel] = None,
                         calibrated_dir=None, raw_official_dir=None,
                         amass_poses_dir=None, out_dir=None) -> Path:
    """TotalCapture -> eval data with accel-bias removal
    (reference: process.py:130-224)."""
    body = body or ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    calibrated_dir = Path(calibrated_dir or C.paths.calibrated_totalcapture)
    raw_official = Path(raw_official_dir or C.paths.raw_totalcapture_official)
    amass_dir = Path(amass_poses_dir or (Path(C.paths.raw_amass) / "TotalCapture"))
    out_dir = Path(out_dir or C.paths.eval_dir)
    inches_to_meters = 0.0254
    subjects = ["S1", "S2", "S3", "S4", "S5"]

    accs, oris, poses, trans = [], [], [], []
    failed_to_process = set()
    for file in sorted(os.listdir(calibrated_dir)):
        if (not file.endswith(".pkl")
                or ("s5" in file and "acting3" in file)
                or not any(file.startswith(s.lower()) for s in subjects)):
            continue
        with open(calibrated_dir / file, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        ori = np.asarray(data["ori"], np.float32)
        acc = np.asarray(data["acc"], np.float32)
        subject, activity = file.split("_")[0], file.split("_")[1].split(".")[0]
        npz = amass_dir / subject.upper() / f"{activity}_poses.npz"
        try:
            pose_aa = np.load(npz)["poses"].astype(np.float32).reshape(-1, 52, 3)
        except Exception:
            # the trans loop below MUST skip this motion too, or every
            # subsequent trans[i] pairs with the wrong sequence
            # (reference: process.py:161-163, failed_to_process)
            failed_to_process.add(f"{subject}_{activity}")
            print(f"Failed to process: {file}")
            continue
        pose_aa[:, 23] = pose_aa[:, 37]
        pose_aa = pose_aa[:, :24]
        n = min(acc.shape[0], pose_aa.shape[0])
        acc, ori, pose_aa = acc[:n], ori[:n], pose_aa[:n]
        # align the AMASS global frame to DIP like the reference's
        # preprocessed pose.pt (the calibrated IMU data is DIP-frame; raw
        # AMASS is z-up): same rotation process_amass applies
        aligned_aa, _ = S.align_amass_to_dip(
            jnp.asarray(pose_aa), jnp.zeros((n, 3), np.float32))
        p = np.asarray(R.axis_angle_to_rotation_matrix(
            jnp.asarray(aligned_aa).reshape(-1, 3))).reshape(-1, 24, 3, 3)
        accs.append(acc); oris.append(ori); poses.append(p)

    # global positions from the official mocap (translation GT)
    for subject in subjects:
        sdir = raw_official / subject
        if not sdir.exists():
            continue
        for motion in sorted(os.listdir(sdir)):
            if ((subject == "S5" and motion == "acting3")
                    or motion.startswith(".")
                    or f"{subject.lower()}_{motion}" in failed_to_process):
                continue
            pos_path = sdir / motion / "gt_skel_gbl_pos.txt"
            with open(pos_path) as f:
                header = f.readline().split("\t")
                idx = [header.index(k) for k in ("LeftFoot", "RightFoot", "Spine")]
                rows = []
                for line in f:
                    cells = line.split("\t")[:-1]
                    if not cells:
                        continue
                    rows.append([[float(v) for v in c.split(" ")] for c in cells])
            pos = np.asarray(rows, np.float32)[:, idx] * inches_to_meters
            pos[:, :, 0] *= -1
            pos[:, :, 2] *= -1
            trans.append(pos[:, 2] - pos[:1, 2])

    # pairing guard (reference: process.py:202-205): both lists were built
    # over the same motion set in the same sorted order; any mismatch means
    # silently mispaired translation GT, so fail loudly
    assert len(accs) == len(trans), (
        f"TotalCapture pairing desync: {len(accs)} IMU sequences vs "
        f"{len(trans)} mocap translations")
    for i in range(len(accs)):
        if accs[i].shape[0] < trans[i].shape[0]:
            trans[i] = trans[i][:accs[i].shape[0]]
        assert trans[i].shape[0] == accs[i].shape[0], (
            f"sequence {i}: trans has {trans[i].shape[0]} frames, "
            f"imu has {accs[i].shape[0]}")
        # remove per-channel accel bias vs synthetic accel (process.py:207-214)
        _, _, vert = _fk_mesh_chunked(body, poses[i], None, trans[i])
        vi = S.tracked_vertex_indices(body.num_vertices)
        vacc = np.asarray(S.synthesize_acceleration(
            jnp.asarray(vert[:, vi])))
        accs[i] = np.asarray(S.remove_acceleration_bias(
            jnp.asarray(accs[i]), jnp.asarray(vacc)))

    path = out_dir / "totalcapture.pt"
    _save_pt({"acc": accs, "ori": oris, "pose": poses, "tran": trans}, path)
    print(f"Preprocessed TotalCapture saved: {path}")
    return path


def process_imuposer(split: str = "train", body=None, raw_dir=None,
                     out_dir=None) -> Path:
    """IMUPoser -> train/eval data (reference: process.py:298-341)."""
    raw_dir = Path(raw_dir or C.paths.raw_imuposer)
    out_dir = Path(out_dir or C.paths.eval_dir)
    subjects = ([f"P{i}" for i in range(1, 9)] if split == "train"
                else ["P9", "P10"])
    out = {k: [] for k in ("acc", "ori", "pose", "tran")}
    for pid_path in sorted(raw_dir.iterdir() if raw_dir.exists() else []):
        if pid_path.name not in subjects:
            continue
        for fpath in sorted(pid_path.iterdir()):
            with open(fpath, "rb") as f:
                fdata = pickle.load(f)
            imu = np.asarray(fdata["imu"], np.float32)
            acc = imu[:, :5 * 3].reshape(-1, 5, 3)
            ori = imu[:, 5 * 3:].reshape(-1, 5, 3, 3)
            pose_aa = np.asarray(fdata["pose"], np.float32)
            tran = np.asarray(fdata["trans"], np.float32)
            p = np.asarray(R.axis_angle_to_rotation_matrix(
                jnp.asarray(pose_aa.reshape(-1, 3)))).reshape(-1, 24, 3, 3)
            p, tran = S.align_imuposer_to_dip(jnp.asarray(p), jnp.asarray(tran))
            out["acc"].append(acc)
            out["ori"].append(ori)
            out["pose"].append(np.asarray(p))
            out["tran"].append(np.asarray(tran))
    path = out_dir / f"imuposer_{split}.pt"
    _save_pt(out, path)
    print(f"Preprocessed IMUPoser saved: {path}")
    return path
