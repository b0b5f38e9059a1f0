"""Tests for the full-motion evaluator and pose-eval protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.evaluation import (
    FullMotionEvaluator, PoseEvaluator, binary_classification_errors,
    binary_confusion_matrix, evaluate_pose, translation_drift,
)
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.kinematics import rotation as R


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


@pytest.fixture(scope="module")
def evaluator(body):
    return FullMotionEvaluator(body, joint_mask=C.EVAL_JOINT_MASK)


def _random_pose(key, T):
    rots = R.generate_random_rotation_matrix(key, T * 24)
    aa = R.rotation_matrix_to_axis_angle(rots) * 0.2
    return np.asarray(R.axis_angle_to_rotation_matrix(aa)).reshape(T, 24, 3, 3)


def test_identical_pose_zero_error(evaluator):
    pose = _random_pose(jax.random.PRNGKey(0), 40)
    errs = evaluator(pose, pose)
    # joint/vertex/angle/translation errors all ~0; jerk rows (4,5) are equal
    for row in (0, 1, 2, 3, 6, 7, 8, 9):
        assert abs(errs[row, 0]) < 1e-3, row
    np.testing.assert_allclose(errs[4], errs[5], rtol=1e-5)


def test_known_rotation_offset(evaluator, body):
    """Rotating one masked joint by exactly 10 degrees must show up in the
    local-angle metrics with the right magnitude."""
    T = 24
    pose_t = np.tile(np.eye(3, dtype=np.float32), (T, 24, 1, 1))
    pose_p = pose_t.copy()
    ang = np.deg2rad(10.0)
    rot = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.asarray([[0.0, ang, 0.0]])))[0]
    joint = C.EVAL_JOINT_MASK[0]  # joint 2, masked
    pose_p[:, joint] = rot
    errs = evaluator(pose_p, pose_t)
    # local angle error (row 2): mean over 24 joints = 10/24 deg
    np.testing.assert_allclose(errs[2, 0], 10.0 / 24, rtol=1e-3)
    # masked local angle error (row 8): 10 deg / 4 masked joints
    np.testing.assert_allclose(errs[8, 0], 10.0 / 4, rtol=1e-3)


def test_padding_invariance(evaluator):
    """Metrics must not depend on the bucket padding: a 40-frame and a
    700-frame (different bucket) sequence sharing the same prefix stats."""
    pose = _random_pose(jax.random.PRNGKey(1), 40)
    tran = np.cumsum(np.random.RandomState(0).randn(40, 3), 0).astype(np.float32) * 0.01
    e1 = evaluator(pose, np.roll(pose, 1, axis=1), tran_p=tran, tran_t=tran * 1.01)
    e2 = evaluator(pose, np.roll(pose, 1, axis=1), tran_p=tran, tran_t=tran * 1.01)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


def test_translation_error_row(evaluator):
    T = C.datasets.fps * 3
    pose = np.tile(np.eye(3, dtype=np.float32), (T, 24, 1, 1))
    tran_t = np.zeros((T, 3), np.float32)
    tran_p = np.zeros((T, 3), np.float32)
    tran_p[:, 0] = np.arange(T) * 0.001   # steady 0.03 m/s drift
    errs = evaluator(pose, pose, tran_p=tran_p, tran_t=tran_t)
    # row 6: mean root translation error per 1s window x100 (cm) = 3 cm
    np.testing.assert_allclose(errs[6, 0], C.datasets.fps * 0.001 * 100, rtol=1e-3)


def test_pose_evaluator_report(body):
    pe = PoseEvaluator(body)
    pose = _random_pose(jax.random.PRNGKey(2), 30)
    errs = pe.eval(pose, pose)
    assert errs.shape == (8, 2)
    # SIP row and masked-angular row identical (kept for reference parity)
    np.testing.assert_allclose(errs[0], errs[2])


def test_translation_drift():
    T = 300
    tran_t = np.zeros((T, 3), np.float32)
    tran_t[:, 0] = np.arange(T) * 0.01          # 1 cm/frame -> 3 m total
    tran_p = tran_t * 0.9                        # 10% under-estimate
    drift = translation_drift(tran_p, tran_t)
    assert 1 in drift and 2 in drift
    np.testing.assert_allclose(drift[1], 0.1, rtol=1e-3)
    np.testing.assert_allclose(drift[2], 0.2, rtol=1e-3)


def test_binary_metrics():
    logits = jnp.asarray([2.0, -1.0, 3.0, -2.0])
    labels = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    cm = np.asarray(binary_confusion_matrix(logits, labels))
    np.testing.assert_array_equal(cm, [[1, 1], [1, 1]])
    errs = np.asarray(binary_classification_errors(logits, labels))
    np.testing.assert_allclose(errs[0], [0.5, 0.5])


def test_evaluate_pose_end_to_end(body):
    """Offline + online protocol runs over a tiny synthetic eval set."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "eval.pt")
        make_synthetic_processed_dataset(f, n_sequences=1, T=60, seed=1,
                                         body_model=body)
        ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                         data_files=[f])
        view = EvalSequence(ds, combo="lw_rp")
        net = MobilePoserNet(body)
        params = init_all_modules(jax.random.PRNGKey(0))
        res = evaluate_pose(net, params, view, online=False,
                            evaluate_tran=True, verbose=False)
        assert res["offline"].shape == (8, 2)
        assert np.all(np.isfinite(res["offline"]))

        # unknown online_mode must raise up front, not silently run the
        # exact path (a parity A/B would compare exact vs exact and report
        # a bogus zero delta)
        import pytest
        with pytest.raises(ValueError, match="online_mode"):
            evaluate_pose(net, params, view, online=True, verbose=False,
                          online_mode="carry-mode")


def test_forward_offline_batched_matches_sequential(body):
    """Batched offline inference over padded sequences must match
    per-sequence forward_offline on each valid prefix."""
    from mobileposer_tpu.evaluation import forward_offline_batched
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    T_pad = 16
    lengths = [16, 9]
    rng = jax.random.PRNGKey(6)
    imus = jax.random.normal(rng, (2, T_pad, 60)) * 0.1
    pose_b, joints_b, tran_b, contact_b = forward_offline_batched(
        net, params, imus, jnp.asarray(lengths))
    for i, L in enumerate(lengths):
        pose_ref, joints_ref, tran_ref, contact_ref = net.forward_offline(
            params, imus[i, :L])
        np.testing.assert_allclose(np.asarray(pose_b[i, :L]),
                                   np.asarray(pose_ref), atol=3e-5)
        np.testing.assert_allclose(np.asarray(tran_b[i, :L]),
                                   np.asarray(tran_ref), atol=3e-5)
        np.testing.assert_allclose(np.asarray(contact_b[i, :L]),
                                   np.asarray(contact_ref), atol=3e-5)


def test_evaluate_pose_batched_matches_serial(body, monkeypatch):
    """The batched ONLINE+offline evaluation (sequences grouped and run as
    independent streams) must reproduce the per-sequence path's metrics —
    with genuinely heterogeneous sequence lengths, so the length grouping,
    per-sequence slicing within a chunk, and last-frame stream padding are
    all exercised (a shrunken pad bucket makes the lengths span TWO
    groups)."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    import mobileposer_tpu.evaluation.evaluator as ev_mod
    import tempfile, os
    # smallest bucket compatible with the evaluator's 128-frame
    # FK blocking
    monkeypatch.setattr(ev_mod, "_BUCKET", 128)
    with tempfile.TemporaryDirectory() as d:
        files = []
        for i, T in enumerate((20, 28, 150)):  # groups: 128, 128, 256
            f = os.path.join(d, f"eval{i}.pt")
            make_synthetic_processed_dataset(f, n_sequences=1, T=T,
                                             seed=2 + i, body_model=body)
            files.append(f)
        ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                         data_files=files)
        view = EvalSequence(ds, combo="lw_rp")
        net = MobilePoserNet(body)
        params = init_all_modules(jax.random.PRNGKey(0))
        res_b = evaluate_pose(net, params, view, online=True,
                              evaluate_tran=True, verbose=False,
                              batch_sequences=True)
        res_s = evaluate_pose(net, params, view, online=True,
                              evaluate_tran=True, verbose=False,
                              batch_sequences=False)
        np.testing.assert_allclose(res_b["offline"], res_s["offline"],
                                   atol=1e-4)
        np.testing.assert_allclose(res_b["online"], res_s["online"],
                                   atol=1e-4)
        for w in res_s.get("tran_errors", {}):
            np.testing.assert_allclose(res_b["tran_errors"][w],
                                       res_s["tran_errors"][w], atol=1e-4)


def test_evaluate_pose_sharded_matches_single(body, monkeypatch):
    """Data-parallel evaluation over the 8-device mesh: identical metrics
    to the single-device run, offline AND ONLINE (the parity-day workload
    scales over chips; sharded CARRY streaming equality is covered by
    test_streaming_carry — one exact-mode A/B keeps this test inside the
    suite's time budget)."""
    import jax.numpy as jnp  # noqa: F401
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.parallel import make_mesh
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as td:
        f = pathlib.Path(td) / "eval.pt"
        make_synthetic_processed_dataset(f, n_sequences=2, T=50, seed=21,
                                         body_model=body)
        ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                         data_files=[f])
        view = EvalSequence(ds, combo="lw_rp")
        net = MobilePoserNet(body)
        params = init_all_modules(jax.random.PRNGKey(2))
        mesh = make_mesh()
        assert mesh.devices.size == 8
        # shrink the padding bucket: the default 512-frame programs compile
        # twice here (single + sharded variants) and dominated the test
        import mobileposer_tpu.evaluation.evaluator as ev_mod
        monkeypatch.setattr(ev_mod, "_BUCKET", 128)  # (>= _FK_BLOCK)
        single = evaluate_pose(net, params, view, online=True,
                               verbose=False)
        sharded = evaluate_pose(net, params, view, online=True,
                                verbose=False, mesh=mesh)
        np.testing.assert_allclose(sharded["offline"], single["offline"],
                                   atol=1e-4)
        np.testing.assert_allclose(sharded["online"], single["online"],
                                   atol=1e-4)
