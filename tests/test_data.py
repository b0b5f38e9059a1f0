"""Tests for virtual-IMU synthesis and the windowed combo dataset."""

import numpy as np
import pytest

import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.data import (
    COMBO_MASKS, COMBO_NAMES, EvalSequence, PoseDataset, foot_ground_probs,
    make_combo_imu, nan_fill_nearest, synthesize_acceleration,
)
from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
from mobileposer_tpu.kinematics import ParametricModel


def _syn_acc_reference(v: np.ndarray, smooth_n: int = 4, fps: int = 30):
    """Literal numpy translation of the reference _syn_acc (process.py:23-35)."""
    mid = smooth_n // 2
    scale = fps ** 2
    acc = np.stack([(v[i] + v[i + 2] - 2 * v[i + 1]) * scale
                    for i in range(v.shape[0] - 2)])
    acc = np.concatenate((np.zeros_like(acc[:1]), acc, np.zeros_like(acc[:1])))
    if mid != 0:
        acc[smooth_n:-smooth_n] = np.stack(
            [(v[i] + v[i + smooth_n * 2] - 2 * v[i + smooth_n]) * scale / smooth_n ** 2
             for i in range(v.shape[0] - smooth_n * 2)])
    return acc


def test_synthesize_acceleration_matches_reference_loop():
    rng = np.random.RandomState(0)
    v = rng.randn(50, 6, 3).astype(np.float32)
    expected = _syn_acc_reference(v)
    got = np.asarray(synthesize_acceleration(jnp.asarray(v)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_foot_ground_probs():
    T = 10
    joint = np.zeros((T, 24, 3), np.float32)
    joint[:, 10, 0] = np.linspace(0, 1, T)        # left foot moving
    # right foot static -> contact after frame 0
    probs = np.asarray(foot_ground_probs(jnp.asarray(joint)))
    assert probs.shape == (T, 2)
    assert probs[0].tolist() == [0.0, 0.0]
    assert np.all(probs[1:, 1] == 1.0)
    assert np.all(probs[1:, 0] == 0.0)


def test_nan_fill_nearest():
    x = np.arange(10, dtype=np.float32)
    x[3] = np.nan
    x[0] = np.nan
    filled = np.asarray(nan_fill_nearest(jnp.asarray(x)))
    assert np.all(np.isfinite(filled))
    assert filled[3] in (2.0, 4.0)


@pytest.fixture(scope="module")
def fixture_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synth.pt"
    make_synthetic_processed_dataset(path, n_sequences=2, T=150, seed=0)
    return path


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


def test_dataset_windows_and_combos(fixture_file, body):
    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture_file])
    # 2 sequences of 150 frames -> windows of 125 + remainder 25 each
    assert len(ds.windows) == 4
    assert len(ds) == 4 * len(COMBO_NAMES)
    s = ds.get(0)
    assert s["imu"].shape[1] == 60

    # combo masking: slots outside the combo must be exactly zero
    for ci, name in enumerate(COMBO_NAMES):
        sample = ds.get(ci)  # window 0, combo ci
        acc = sample["imu"][:, :15].reshape(-1, 5, 3)
        ori = sample["imu"][:, 15:].reshape(-1, 5, 3, 3)
        active = set(C.COMBOS[name])
        for slot in range(5):
            if slot in active:
                assert np.any(acc[:, slot] != 0) or np.any(ori[:, slot] != 0)
            else:
                assert np.all(acc[:, slot] == 0), (name, slot)
                assert np.all(ori[:, slot] == 0), (name, slot)


def test_dataset_velocity_gt(fixture_file, body):
    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture_file])
    w = ds.windows[0]
    scale = C.datasets.fps / C.amass.vel_scale
    vels = w["vels"].reshape(-1, 24, 3)
    joints = w["joints"].reshape(-1, 24, 3)
    tran = w["tran"]
    # frame 0 is zero; root channel uses tran diff
    np.testing.assert_allclose(vels[0], 0.0)
    np.testing.assert_allclose(vels[1:, 0], (tran[1:] - tran[:-1]) * scale,
                               atol=1e-5)
    np.testing.assert_allclose(vels[1:, 5], (joints[1:, 5] - joints[:-1, 5]) * scale,
                               atol=1e-4)


def test_dataset_batches(fixture_file, body):
    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture_file])
    rng = np.random.default_rng(0)
    batches = list(ds.batches(8, rng))
    assert len(batches) == len(ds) // 8
    b = batches[0]
    W = C.datasets.window_length
    assert b["imu"].shape == (8, W, 60)
    assert b["pose_r6d"].shape == (8, W, 24, 6)
    assert b["vels"].shape == (8, W, 72)
    assert b["lengths"].min() >= 1 and b["lengths"].max() <= W
    # padding beyond lengths must be zero
    for bi in range(8):
        L = b["lengths"][bi]
        assert np.all(b["imu"][bi, L:] == 0)


def test_eval_sequence_view(fixture_file, body):
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[fixture_file])
    assert len(ds.windows) == 2           # whole sequences, no windowing
    view = EvalSequence(ds, combo="lw_rp")
    imu, pose_local, joints, tran = view[0]
    assert imu.shape == (150, 60)
    assert pose_local.shape == (150, 24, 3, 3)
    # eval keeps *local* pose: root-local identity-ish random rotations, but
    # crucially different from the global pose stored for training
    ds_train = PoseDataset(fold="train", body_model=body,
                           data_files=[fixture_file])
    r6d_train = ds_train.windows[0]["pose_r6d"]
    r6d_eval = ds.windows[0]["pose_r6d"][:125]
    assert not np.allclose(r6d_train, r6d_eval)


def test_make_combo_imu_matches_host_masking(fixture_file, body):
    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture_file])
    w = ds.windows[0]
    mask = COMBO_MASKS[COMBO_NAMES.index("lw_rp")]
    on_device = np.asarray(make_combo_imu(
        jnp.asarray(w["acc"]), jnp.asarray(w["ori"]), jnp.asarray(mask)))
    host = ds.get(COMBO_NAMES.index("lw_rp"))["imu"]
    np.testing.assert_allclose(on_device, host, atol=1e-6)


def test_batch_prefetcher():
    from mobileposer_tpu.data import BatchPrefetcher
    items = [{"i": i} for i in range(7)]
    got = list(BatchPrefetcher(iter(items), depth=2))
    assert got == items

    def failing():
        yield {"i": 0}
        raise ValueError("worker boom")

    pf = BatchPrefetcher(failing())
    assert next(pf) == {"i": 0}
    with pytest.raises(ValueError, match="worker boom"):
        next(pf)


def test_monolith_releases_window_copies(body, tmp_path):
    """After batch assembly builds the monolith, the per-window dicts must
    be views into it (the per-sequence parent arrays are released — they
    previously stayed alive alongside the monolith, doubling host RAM)."""
    f = tmp_path / "mono.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=260, seed=4,
                                     body_model=body)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f],
                     combos=["lw_rp"])
    ds._assemble(np.arange(2), C.datasets.window_length)
    for w in ds.windows:
        assert "pose_local" not in w          # training never reads it
        for k in ("acc", "ori", "joints"):
            assert np.shares_memory(w[k], ds._mono[k])
    # batch assembly still works and masks correctly after the swap
    batch = ds._assemble(np.arange(2), C.datasets.window_length)
    assert batch["imu"].shape[2] == 60
