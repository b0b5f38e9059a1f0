"""Pin the training-data pipeline against an independent torch replica.

Same pattern as tests/test_evaluator_parity.py / test_fusion_parity.py: the
reference's dataset semantics are re-implemented here in literal eager torch
(float64, per-sequence python loops, torch.split / nn-style padding) straight
from the documented behavior of `mobileposer/data.py` —

  * per-combo zero-masking and [acc(15) | ori(45)] concat order
    (data.py:69-76),
  * 125-frame `torch.split` window boundaries with a short remainder window
    (data.py:78-82),
  * global-vs-local target pose for train vs evaluate folds (data.py:64-67),
  * velocity ground truth: frame-diff joints with the root row overwritten by
    the translation diff, scaled by fps/vel_scale (data.py:87-92),
  * `__getitem__`'s r6d conversion + pred_joints_set select (data.py:94-107),
  * `pad_seq`'s zero-padded batch-first collate with per-tensor lengths
    (data.py:112-139)

— and compared sample-by-sample and batch-by-batch against
`mobileposer_tpu/data/dataset.py` on synthetic sequences over the synthetic
body. A silent drift in any of these would train models on different data;
this file makes it fail CI instead.

The replica shares no structure with the implementation under test: the
framework stores each window once and applies combo masks at batch assembly
(windows x combos sample space, monolith fancy-indexing); the replica
materializes every sequence x combo up front exactly like the reference.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.data.fixtures import synthetic_sequence
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.kinematics.smpl import synthetic_smpl_arrays

_N_VERTS = 240
_W = C.datasets.window_length          # 125
_COMBOS = list(C.COMBOS.items())       # same 12-entry order as the reference


# ---------------------------------------------------------------------------
# Independent torch replica (float64, eager, literal)
# ---------------------------------------------------------------------------

def _torch_fk(arrays: dict, pose: torch.Tensor):
    """FK as a literal per-joint loop (reference model.py:208-230; called
    from data.py:64 without translation). Returns global rotations
    [N,24,3,3] and joint positions [N,24,3] (root at origin)."""
    parents = arrays["parents"]
    J = torch.tensor(np.asarray(arrays["J"]), dtype=torch.float64)
    j = J - J[:1]                      # root-aligned zero pose (model.py:86)
    n = pose.shape[0]
    rg = [pose[:, 0]]
    pg = [j[0].expand(n, 3)]
    for i in range(1, j.shape[0]):
        p = parents[i]
        bone = (j[i] - j[p]).expand(n, 3)
        rg.append(rg[p] @ pose[:, i])
        pg.append(pg[p] + (rg[p] @ bone.unsqueeze(-1)).squeeze(-1))
    return torch.stack(rg, dim=1), torch.stack(pg, dim=1)


def _torch_r6d(r: torch.Tensor) -> torch.Tensor:
    """reference angular.py:185-192: first two columns, transposed."""
    return r.reshape(-1, 3, 3)[:, :, :2].transpose(1, 2).clone().reshape(-1, 6)


def _ref_prepare(arrays, seqs, evaluate=None, finetune=None):
    """Literal replica of _prepare_dataset/_process_* (data.py:45-92)."""
    data = {key: [] for key in ["imu_inputs", "pose_outputs", "joint_outputs",
                                "tran_outputs", "vel_outputs", "foot_outputs"]}
    for seq in seqs:
        acc = torch.tensor(seq["acc"], dtype=torch.float64)[:, :5] / C.amass.acc_scale
        ori = torch.tensor(seq["ori"], dtype=torch.float64)[:, :5]
        pose = torch.tensor(seq["pose"], dtype=torch.float64).view(-1, 24, 3, 3)
        tran = torch.tensor(seq["tran"], dtype=torch.float64).view(-1, 3)
        foot = torch.tensor(seq["contact"], dtype=torch.float64)
        pose_global, joint = _torch_fk(arrays, pose)
        pose_t = pose if evaluate else pose_global        # data.py:65
        joint = joint.view(-1, 24, 3)
        for _, c in _COMBOS:                              # data.py:69-82
            combo_acc = torch.zeros_like(acc)
            combo_ori = torch.zeros_like(ori)
            combo_acc[:, list(c)] = acc[:, list(c)]
            combo_ori[:, list(c)] = ori[:, list(c)]
            imu_input = torch.cat([combo_acc.flatten(1), combo_ori.flatten(1)],
                                  dim=1)
            data_len = len(imu_input) if evaluate else C.datasets.window_length
            for key, value in zip(["imu_inputs", "pose_outputs",
                                   "joint_outputs", "tran_outputs"],
                                  [imu_input, pose_t, joint, tran]):
                data[key].extend(torch.split(value, data_len))
            if not (evaluate or finetune):                # data.py:84-92
                root_vel = torch.cat((torch.zeros(1, 3, dtype=torch.float64),
                                      tran[1:] - tran[:-1]))
                vel = torch.cat((torch.zeros(1, 24, 3, dtype=torch.float64),
                                 torch.diff(joint, dim=0)))
                vel[:, 0] = root_vel
                data["vel_outputs"].extend(torch.split(
                    vel * (C.datasets.fps / C.amass.vel_scale), data_len))
                data["foot_outputs"].extend(torch.split(foot, data_len))
    return data


def _ref_getitem(data, idx, evaluate=None, finetune=None):
    """Literal replica of __getitem__ (data.py:94-107)."""
    imu = data["imu_inputs"][idx].float()
    joint = data["joint_outputs"][idx].float()
    tran = data["tran_outputs"][idx].float()
    num_pred = len(C.amass.pred_joints_set)
    pose = _torch_r6d(data["pose_outputs"][idx]).reshape(
        -1, num_pred, 6)[:, list(C.amass.pred_joints_set)].reshape(
        -1, 6 * num_pred).float()
    if evaluate or finetune:
        return imu, pose, joint, tran
    vel = data["vel_outputs"][idx].float()
    contact = data["foot_outputs"][idx].float()
    return imu, pose, joint, tran, vel, contact


def _ref_pad_seq(batch):
    """Literal replica of pad_seq (data.py:112-139)."""

    def _pad(sequence):
        padded = torch.nn.utils.rnn.pad_sequence(sequence, batch_first=True)
        lengths = [seq.shape[0] for seq in sequence]
        return padded, lengths

    inputs, poses, joints, trans = zip(
        *[(item[0], item[1], item[2], item[3]) for item in batch])
    inputs, input_lengths = _pad(inputs)
    poses, _ = _pad(poses)
    joints, _ = _pad(joints)
    trans, _ = _pad(trans)
    outputs = {"poses": poses, "joints": joints, "trans": trans}
    if len(batch[0]) > 5:
        vels, foots = zip(*[(item[4], item[5]) for item in batch])
        outputs["foot_contacts"], _ = _pad(foots)
        outputs["vels"], _ = _pad(vels)
    return (inputs, input_lengths), outputs


# ---------------------------------------------------------------------------
# Fixtures: two sequences with a remainder window (260 = 125+125+10; 150 =
# 125+25), processed once per module.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    body = ParametricModel.synthetic(num_vertices=_N_VERTS)
    arrays = synthetic_smpl_arrays(_N_VERTS, seed=0)
    rng = np.random.default_rng(7)
    seqs = [synthetic_sequence(body, rng, T=260),
            synthetic_sequence(body, rng, T=150)]
    n_windows = [3, 2]                  # ceil(260/125), ceil(150/125)
    return body, arrays, seqs, n_windows


def _write_pt(tmp_path, seqs):
    f = tmp_path / "parity.pt"
    data = {key: [torch.from_numpy(np.array(s[key])) for s in seqs]
            for key in ("pose", "tran", "joint", "acc", "ori", "contact")}
    torch.save(data, f)
    return f


def _index_map(n_windows):
    """(ref_idx, our_idx) pairs for every sample.

    Reference order (data.py:49-82): seq-major, combo-middle, window-minor.
    Ours (dataset.py): windows seq-major/window-minor; idx = win*12 + combo.
    """
    pairs = []
    ref_base = 0
    win_base = 0
    for nw in n_windows:
        for ci in range(len(_COMBOS)):
            for w in range(nw):
                pairs.append((ref_base + ci * nw + w,
                              (win_base + w) * len(_COMBOS) + ci))
        ref_base += len(_COMBOS) * nw
        win_base += nw
    return pairs


# ---------------------------------------------------------------------------
# Train fold
# ---------------------------------------------------------------------------

def test_train_samples_match_replica(tmp_path, setup):
    body, arrays, seqs, n_windows = setup
    f = _write_pt(tmp_path, seqs)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f])
    ref = _ref_prepare(arrays, seqs)

    assert len(ds) == len(ref["imu_inputs"]) == sum(n_windows) * len(_COMBOS)

    for ref_idx, our_idx in _index_map(n_windows):
        imu, pose, joint, tran, vel, contact = _ref_getitem(ref, ref_idx)
        ours = ds.get(our_idx)
        T = imu.shape[0]
        # combo masking + concat order + acc scale: no FK involved -> tight
        np.testing.assert_allclose(ours["imu"], imu.numpy(),
                                   atol=1e-6, rtol=0,
                                   err_msg=f"imu sample {ref_idx}")
        # FK-derived targets: our f32 JAX FK vs the f64 literal loop
        np.testing.assert_allclose(
            ours["pose_r6d"].reshape(T, -1), pose.numpy(),
            atol=2e-5, rtol=1e-4, err_msg=f"pose_r6d sample {ref_idx}")
        np.testing.assert_allclose(
            ours["joints"].reshape(T, 24, 3), joint.numpy(),
            atol=2e-5, rtol=1e-4, err_msg=f"joints sample {ref_idx}")
        np.testing.assert_allclose(ours["tran"], tran.numpy(),
                                   atol=1e-6, rtol=0)
        # velocity GT: diff x 15 amplifies FK noise slightly
        np.testing.assert_allclose(
            ours["vels"].reshape(T, 24, 3), vel.numpy(),
            atol=5e-4, rtol=1e-3, err_msg=f"vels sample {ref_idx}")
        np.testing.assert_allclose(ours["contacts"], contact.numpy(),
                                   atol=0, rtol=0)


def test_batch_assembly_matches_pad_seq(tmp_path, setup):
    body, arrays, seqs, n_windows = setup
    f = _write_pt(tmp_path, seqs)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f])
    ref = _ref_prepare(arrays, seqs)
    pairs = _index_map(n_windows)

    # a batch mixing full 125-frame windows with both remainder windows
    # (10- and 25-frame) across different combos
    rng = np.random.default_rng(3)
    chosen = [pairs[i] for i in rng.permutation(len(pairs))[:8]]
    ref_batch = [_ref_getitem(ref, ri) for ri, _ in chosen]
    (inputs, input_lengths), outputs = _ref_pad_seq(ref_batch)

    W = max(w["acc"].shape[0] for w in ds.windows)
    ours = ds._assemble([oi for _, oi in chosen], W)
    assert W == _W == inputs.shape[1]

    np.testing.assert_array_equal(ours["lengths"], input_lengths)
    np.testing.assert_allclose(ours["imu"], inputs.numpy(), atol=1e-6, rtol=0)
    B = len(chosen)
    np.testing.assert_allclose(ours["pose_r6d"].reshape(B, W, -1),
                               outputs["poses"].numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(ours["joints"].reshape(B, W, 24, 3),
                               outputs["joints"].numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(ours["tran"], outputs["trans"].numpy(),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(ours["vels"].reshape(B, W, 24, 3),
                               outputs["vels"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(ours["contacts"],
                               outputs["foot_contacts"].numpy(), atol=0, rtol=0)


def test_window_boundaries_match_torch_split(tmp_path, setup):
    """torch.split(value, 125) boundaries == our range(0, T, 125) slices,
    including the short remainder window (data.py:78-82)."""
    body, arrays, seqs, n_windows = setup
    f = _write_pt(tmp_path, seqs)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f])
    ref = _ref_prepare(arrays, seqs)
    ref_lengths = [t.shape[0] for t in ref["imu_inputs"]]
    our_lengths = [ds.get(oi)["imu"].shape[0]
                   for _, oi in sorted(_index_map(n_windows))]
    assert [ref_lengths[ri] for ri, _ in sorted(_index_map(n_windows))] == \
        our_lengths
    assert sorted(set(our_lengths)) == [10, 25, 125]


# ---------------------------------------------------------------------------
# Evaluate / finetune folds
# ---------------------------------------------------------------------------

def test_eval_fold_keeps_local_pose(tmp_path, setup):
    """evaluate: whole sequences, r6d of the LOCAL pose (data.py:65,78),
    4-tuple items (no vel/contact)."""
    body, arrays, seqs, n_windows = setup
    f = _write_pt(tmp_path, seqs)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[f])
    ref = _ref_prepare(arrays, seqs, evaluate="dip")

    assert len(ds) == len(ref["imu_inputs"]) == len(seqs) * len(_COMBOS)
    # ref order: seq-major, combo-minor (one window per sequence);
    # ours: window(=seq)-major with combo-minor within
    for s in range(len(seqs)):
        for ci in range(len(_COMBOS)):
            imu, pose, joint, tran = _ref_getitem(
                ref, s * len(_COMBOS) + ci, evaluate="dip")
            ours = ds.get(s * len(_COMBOS) + ci)
            T = imu.shape[0]
            np.testing.assert_allclose(ours["imu"], imu.numpy(),
                                       atol=1e-6, rtol=0)
            # local pose is the raw input: conversion must agree to f32 eps
            np.testing.assert_allclose(ours["pose_r6d"].reshape(T, -1),
                                       pose.numpy(), atol=1e-6, rtol=1e-5)
            np.testing.assert_allclose(ours["joints"].reshape(T, 24, 3),
                                       joint.numpy(), atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(ours["tran"], tran.numpy(),
                                       atol=1e-6, rtol=0)


def test_finetune_fold_windows_with_global_pose(tmp_path, setup):
    """finetune: 125-frame windows like train, GLOBAL pose targets, but no
    velocity/contact in the items (data.py:78,84: data_len stays
    window_length because self.evaluate is None, and the vel branch is
    skipped because self.finetune is set)."""
    body, arrays, seqs, n_windows = setup
    f = _write_pt(tmp_path, seqs)
    ds = PoseDataset(fold="train", finetune="dip", body_model=body,
                     data_files=[f])
    ref = _ref_prepare(arrays, seqs, finetune="dip")

    assert len(ds) == len(ref["imu_inputs"]) == sum(n_windows) * len(_COMBOS)
    ri, oi = _index_map(n_windows)[5]
    imu, pose, joint, tran = _ref_getitem(ref, ri, finetune="dip")
    ours = ds.get(oi)
    T = imu.shape[0]
    np.testing.assert_allclose(ours["imu"], imu.numpy(), atol=1e-6, rtol=0)
    np.testing.assert_allclose(ours["pose_r6d"].reshape(T, -1), pose.numpy(),
                               atol=2e-5, rtol=1e-4)
