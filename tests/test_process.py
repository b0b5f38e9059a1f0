"""Tests for the raw-dataset processors over fabricated miniature datasets
(the real AMASS/DIP/TotalCapture/IMUPoser blobs are not shipped)."""

import os
import pickle
from pathlib import Path

import numpy as np
import pytest

from mobileposer_tpu.data.process import (
    process_amass, process_dipimu, process_imuposer, process_totalcapture)
from mobileposer_tpu.data.dataset import load_processed_file
from mobileposer_tpu.kinematics import ParametricModel


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


def _rand_aa(rng, n, joints=52, scale=0.1):
    return (rng.standard_normal((n, joints * 3)) * scale).astype(np.float32)


def test_process_amass(tmp_path, body):
    rng = np.random.default_rng(0)
    raw = tmp_path / "amass"
    seq_dir = raw / "MiniSet" / "subject1"
    seq_dir.mkdir(parents=True)
    T = 80
    np.savez(seq_dir / "walk_poses.npz",
             poses=_rand_aa(rng, T), trans=rng.standard_normal(
                 (T, 3)).astype(np.float32) * 0.1,
             betas=np.zeros(16, np.float32), mocap_framerate=np.float64(60))
    # unsupported framerate is skipped
    np.savez(seq_dir / "skip_poses.npz",
             poses=_rand_aa(rng, 10), trans=np.zeros((10, 3), np.float32),
             betas=np.zeros(16, np.float32), mocap_framerate=np.float64(100))
    out = tmp_path / "processed"
    written = process_amass(body=body, amass_datasets=["MiniSet"],
                            raw_dir=raw, out_dir=out)
    assert len(written) == 1
    seqs = load_processed_file(written[0])
    assert len(seqs) == 1
    s = seqs[0]
    assert s["pose"].shape == (40, 24, 3, 3)   # 60 fps -> 30 fps
    assert s["acc"].shape == (40, 6, 3)
    assert s["ori"].shape == (40, 6, 3, 3)
    assert s["contact"].shape == (40, 2)
    # boundary frames of the synthetic accel are zero by construction
    np.testing.assert_allclose(s["acc"][0], 0.0)


def test_process_dipimu(tmp_path, body):
    rng = np.random.default_rng(1)
    raw = tmp_path / "dip"
    (raw / "s_09").mkdir(parents=True)
    T = 130
    acc = rng.standard_normal((T, 17, 3)).astype(np.float64)
    acc[3, 7, 0] = np.nan                      # NaN healing path
    data = {"imu_acc": acc,
            "imu_ori": rng.standard_normal((T, 17, 3, 3)).astype(np.float64),
            "gt": _rand_aa(rng, T, joints=24)}
    with open(raw / "s_09" / "01.pkl", "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "eval"
    path = process_dipimu(split="test", body=body, raw_dir=raw, out_dir=out)
    seqs = load_processed_file(path)
    assert len(seqs) == 1
    s = seqs[0]
    n = (T - 12 + 1) // 2  # [6:-6:2]
    assert s["pose"].shape == (n, 24, 3, 3)
    assert s["acc"].shape == (n, 6, 3)
    assert np.isfinite(s["acc"]).all()
    assert s["joint"].shape == (n, 24, 3)


def test_process_imuposer(tmp_path, body):
    import torch
    rng = np.random.default_rng(2)
    raw = tmp_path / "imuposer"
    (raw / "P9").mkdir(parents=True)
    T = 50
    imu = np.concatenate([
        rng.standard_normal((T, 15)).astype(np.float32),
        np.tile(np.eye(3, dtype=np.float32).ravel(), (T, 5))], axis=1)
    data = {"imu": torch.from_numpy(imu),
            "pose": torch.from_numpy(_rand_aa(rng, T, joints=24)),
            "trans": torch.from_numpy(
                rng.standard_normal((T, 3)).astype(np.float32))}
    with open(raw / "P9" / "seq1.pkl", "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "eval"
    path = process_imuposer(split="test", raw_dir=raw, out_dir=out)
    seqs = load_processed_file(path)
    assert len(seqs) == 1
    assert seqs[0]["acc"].shape == (T, 5, 3)
    assert seqs[0]["pose"].shape == (T, 24, 3, 3)


def test_process_totalcapture(tmp_path, body):
    rng = np.random.default_rng(3)
    T = 40
    calibrated = tmp_path / "tc_imu"
    calibrated.mkdir()
    with open(calibrated / "s1_acting1.pkl", "wb") as f:
        pickle.dump({"ori": rng.standard_normal((T, 6, 3, 3)),
                     "acc": rng.standard_normal((T, 6, 3))}, f)
    # a motion with calibrated IMU + official mocap but NO AMASS npz: both
    # loops must skip it or accs[i]/trans[i] pairing desynchronizes
    with open(calibrated / "s1_aamissing.pkl", "wb") as f:
        pickle.dump({"ori": rng.standard_normal((T, 6, 3, 3)),
                     "acc": rng.standard_normal((T, 6, 3))}, f)
    amass = tmp_path / "amass_tc"
    (amass / "S1").mkdir(parents=True)
    np.savez(amass / "S1" / "acting1_poses.npz",
             poses=_rand_aa(rng, T), trans=np.zeros((T, 3), np.float32),
             betas=np.zeros(16, np.float32), mocap_framerate=np.float64(60))
    official = tmp_path / "tc_official"
    joints = ["LeftFoot", "RightFoot", "Spine", "Head"]
    for motion, rows in (("aamissing", T + 5), ("acting1", T)):
        (official / "S1" / motion).mkdir(parents=True)
        with open(official / "S1" / motion / "gt_skel_gbl_pos.txt", "w") as f:
            f.write("\t".join(joints) + "\t\n")
            for t in range(rows):
                row = "\t".join(
                    " ".join("%g" % v for v in rng.standard_normal(3))
                    for _ in joints)
                f.write(row + "\t\n")
    out = tmp_path / "eval"
    path = process_totalcapture(body=body, calibrated_dir=calibrated,
                                raw_official_dir=official,
                                amass_poses_dir=amass, out_dir=out)
    seqs = load_processed_file(path)
    assert len(seqs) == 1
    s = seqs[0]
    assert s["acc"].shape == (T, 6, 3)
    assert s["tran"].shape[1] == 3
