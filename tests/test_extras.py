"""Tests for RNNWithInit, IO helpers, viz exports, physics hook."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn.lstm import LSTMConfig
from mobileposer_tpu.nn.rnn_with_init import (
    RNNWithInitConfig, init_rnn_with_init, rnn_with_init_apply)


def test_rnn_with_init_shapes_and_effect():
    cfg = RNNWithInitConfig(LSTMConfig(6, 4, 8, bidirectional=False), n_init=5)
    params = init_rnn_with_init(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((2, 7, 6))
    init_a = jnp.zeros((2, 5))
    init_b = jnp.ones((2, 5))
    y_a, hc_a = rnn_with_init_apply(params, cfg, x, init_a)
    y_b, _ = rnn_with_init_apply(params, cfg, x, init_b)
    assert y_a.shape == (2, 7, 4)
    assert hc_a[0].shape == (2, 2, 8)   # [n_layers*n_dir, B, H]
    # the init vector must actually influence the output
    assert not np.allclose(np.asarray(y_a), np.asarray(y_b))


def test_txt_io(tmp_path):
    from mobileposer_tpu.utils.io import load_txt_mat, save_txt_mat
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    save_txt_mat(tmp_path / "m.txt", m)
    m2 = load_txt_mat(tmp_path / "m.txt")
    np.testing.assert_allclose(m2, m)


def test_viz_exports(tmp_path):
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.viz import MotionDump, SMPLViewer
    body = ParametricModel.synthetic(num_vertices=48)
    T = 6
    pose = np.tile(np.eye(3, dtype=np.float32), (T, 24, 1, 1))
    tran = np.zeros((T, 3), np.float32)

    dump = MotionDump(body, tmp_path)
    n = dump.save_obj_sequence(pose, tran, stride=3)
    assert n == 2
    assert (tmp_path / "frame_00000.obj").exists()

    viewer = SMPLViewer(body, tmp_path)
    out = viewer.view(pose, tran, pose_t=pose, tran_t=tran, name="v")
    z = np.load(out)
    assert z["pose_p"].shape == (T, 24, 3, 3)
    # GT body offset on +x
    np.testing.assert_allclose(z["tran_t"][:, 0], 1.0)
    assert (tmp_path / "pose.txt").exists()


def test_physics_optimizer():
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.physics import PhysicsOptimizer
    body = ParametricModel.synthetic(num_vertices=48)
    opt = PhysicsOptimizer(body_model=body, smoothing=0.3)
    state = opt.reset_states()
    rng = np.random.RandomState(0)
    pose = np.tile(np.eye(3, dtype=np.float32), (24, 1, 1))
    step = jax.jit(opt.optimize_frame)
    (p1, t1), state = step(jnp.asarray(pose), jnp.zeros((24, 3)),
                           jnp.asarray([3.0, -3.0]), None, state)
    # first frame passes through unchanged
    np.testing.assert_allclose(np.asarray(p1), pose, atol=1e-5)
    # second frame with a different pose gets smoothed toward the first
    from mobileposer_tpu.kinematics import rotation as R
    pose2 = np.asarray(R.axis_angle_to_rotation_matrix(
        jnp.tile(jnp.asarray([[0.5, 0.0, 0.0]]), (24, 1)))).reshape(24, 3, 3)
    (p2, t2), state = step(jnp.asarray(pose2), jnp.zeros((24, 3)),
                           jnp.asarray([3.0, -3.0]), None, state)
    ang_raw = np.asarray(R.angle_between(jnp.asarray(pose2), jnp.asarray(pose)))
    ang_sm = np.asarray(R.angle_between(p2.reshape(-1, 3, 3), jnp.asarray(pose)))
    assert np.all(ang_sm < ang_raw + 1e-6)
    assert np.all(np.isfinite(np.asarray(t2)))
    # output remains a valid rotation
    rtr = np.einsum("jab,jcb->jac", np.asarray(p2), np.asarray(p2))
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), rtr.shape),
                               atol=1e-5)


def test_cast_params_bf16_inference():
    """bf16-cast params must run the composite and stay within bf16
    tolerance of fp32."""
    import jax.numpy as jnp
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, forward, init_all_modules
    from mobileposer_tpu.nn import cast_params
    body = ParametricModel.synthetic(num_vertices=48)
    params = init_all_modules(jax.random.PRNGKey(0))
    imu = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 60)) * 0.1
    pose32, joints32, *_ = forward(params, imu, body)
    p16 = cast_params(params, jnp.bfloat16)
    pose16, joints16, *_ = forward(p16, imu.astype(jnp.bfloat16), body)
    err = np.abs(np.asarray(joints16, np.float32) - np.asarray(joints32))
    assert err.max() < 0.05   # bf16 has ~3 decimal digits


def test_evaluate_helpers():
    from mobileposer_tpu.utils.testing import (
        evaluate_next_batch, evaluate_over_dataset)
    batches = [{"x": np.full((2,), v)} for v in (1.0, 2.0, 3.0)]
    predict = lambda b: b["x"] * 2
    l1 = lambda p, b: np.mean(np.abs(p - b["x"]))
    l2 = lambda p, b: np.mean((p - b["x"]) ** 2)
    means = evaluate_over_dataset(predict, [l1, l2], batches)
    np.testing.assert_allclose(means, [2.0, 14.0 / 3])
    first = evaluate_next_batch(predict, [l1], batches)
    np.testing.assert_allclose(first, [1.0])


def test_orientation_monitor(capsys):
    from mobileposer_tpu.stream import SensorData
    from mobileposer_tpu.viz.orientation_monitor import OrientationMonitor
    sd = SensorData()
    sd.update_virtual(0, np.array([0.1, 0.2, 0.3]), np.array([0, 0, 0, 1.0]))
    mon = OrientationMonitor(interval=0.0)
    out = mon.render(sd)
    assert out is not None and "Left_phone" in out
    assert "0.10" in out


def test_chumpy_shim_smpl_load(tmp_path):
    """Official-style SMPL pickles referencing chumpy load without chumpy
    installed (the shim captures the objects; arrays come from .x)."""
    import pickle
    import sys
    import types
    from mobileposer_tpu.kinematics.smpl import (
        load_smpl_arrays, synthetic_smpl_arrays)

    # fabricate a 'chumpy' module, pickle objects from it, then remove it
    fake = types.ModuleType("chumpy")
    exec("class Ch:\n    def __init__(self, x):\n        self.x = x\n",
         fake.__dict__)
    Ch = fake.Ch
    sys.modules["chumpy"] = fake
    arrays = synthetic_smpl_arrays(num_vertices=48)
    data = {
        "J_regressor": arrays["J_regressor"],
        "weights": arrays["weights"],
        "posedirs": Ch(arrays["posedirs"]),
        "shapedirs": Ch(arrays["shapedirs"]),
        "v_template": Ch(arrays["v_template"]),
        "J": Ch(arrays["J"]),
        "f": arrays["f"],
        "kintree_table": np.stack([
            np.array([0xffffffff] + list(arrays["parents"][1:]), np.int64),
            np.arange(24)]),
    }
    path = tmp_path / "smpl.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    del sys.modules["chumpy"]            # simulate chumpy not installed
    try:
        out = load_smpl_arrays(str(path))
    finally:
        sys.modules.pop("chumpy", None)
    np.testing.assert_allclose(out["v_template"], arrays["v_template"])
    np.testing.assert_allclose(out["shapedirs"], arrays["shapedirs"])
    assert out["parents"][0] == -1
    assert out["parents"][1:] == tuple(arrays["parents"][1:])


def test_synthetic_body_too_small_raises():
    from mobileposer_tpu.kinematics.smpl import synthetic_smpl_arrays
    with pytest.raises(ValueError, match="vertices"):
        synthetic_smpl_arrays(num_vertices=16)


def test_evaluate_over_dataset_empty_raises():
    from mobileposer_tpu.utils.testing import evaluate_over_dataset
    with pytest.raises(ValueError, match="no batches"):
        evaluate_over_dataset(lambda b: b, [lambda p, b: 0.0], [])


def test_metrics_sinks(tmp_path):
    """JSONL/CSV/TensorBoard sinks all receive records; spec parsing and
    unknown-kind rejection (the reference's wandb logging, train.py:40-46,
    generalized for a zero-egress host)."""
    import json
    from mobileposer_tpu.utils.metrics import make_sinks
    spec = (f"jsonl:{tmp_path}/m.jsonl,csv:{tmp_path}/m.csv,"
            f"tensorboard:{tmp_path}/tb")
    sink = make_sinks(spec)
    for epoch in range(2):
        sink.log({"module": "joints", "epoch": epoch,
                  "train_loss": 1.0 - epoch * 0.1, "val_loss": 0.9})
    sink.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(lines) == 2 and lines[1]["epoch"] == 1
    rows = open(tmp_path / "m.csv").read().strip().splitlines()
    assert rows[0].startswith("module,epoch") and len(rows) == 3
    assert any((tmp_path / "tb").glob("events.out.tfevents.*"))

    import pytest
    with pytest.raises(ValueError):
        make_sinks("bogus:x")
    assert make_sinks(None).sinks == []


def test_training_manager_metrics_spec(tmp_path):
    """TrainingManager threads the metrics spec through to sinks."""
    import numpy as np
    from mobileposer_tpu.data import PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.train import TrainingManager
    body = ParametricModel.synthetic(num_vertices=48)
    f = tmp_path / "d.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=150, seed=0,
                                     body_model=body)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f],
                     combos=["lw_rp"])
    mgr = TrainingManager(fast_dev_run=True)
    mgr.train_module("footcontact", ds, tmp_path / "ckpt",
                     metrics=f"csv:{tmp_path}/train.csv")
    rows = open(tmp_path / "train.csv").read().strip().splitlines()
    assert len(rows) >= 2


def test_offline_renderer(tmp_path):
    """render_motion turns an SMPLViewer bundle into PNG frames + GIF
    (headless replacement for the reference's live dual-body view)."""
    import jax
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.viz import SMPLViewer, render_motion
    body = ParametricModel.synthetic(num_vertices=48)
    n = 6
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 24, 3, 3))
    tran = np.cumsum(np.full((n, 3), 0.01, np.float32), axis=0)
    viewer = SMPLViewer(body, out_dir=tmp_path / "dump")
    bundle = viewer.view(eye, tran, pose_t=eye, tran_t=tran, name="v")
    out = render_motion(bundle, tmp_path / "render", body=body, stride=2,
                        gif=True)
    assert out.name == "motion.gif" and out.exists()
    pngs = sorted((tmp_path / "render").glob("frame_*.png"))
    assert len(pngs) == 3

    from mobileposer_tpu.cli import render as render_cli
    render_cli_out = tmp_path / "render_cli"
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    orig = smpl_mod.ParametricModel.from_file_or_synthetic
    smpl_mod.ParametricModel.from_file_or_synthetic = classmethod(
        lambda cls, *a, **k: body)
    try:
        render_cli.main([str(bundle), "--out", str(render_cli_out),
                         "--stride", "3"])
    finally:
        smpl_mod.ParametricModel.from_file_or_synthetic = orig
    assert list(render_cli_out.glob("frame_*.png"))


def test_debug_params_round_trip_and_live_reload(tmp_path):
    """Headless replacement for the reference's bullet debug sliders
    (bullet.py:38-84): same json schema, slider-like clamping, live
    reload on file change."""
    import json, os, time
    from mobileposer_tpu.physics import DebugParams
    f = tmp_path / "dbg.json"
    attrs = [{"name": "kp", "min": 0.0, "max": 10.0, "value": 2.5},
             {"name": "kd", "min": 0.0, "max": 1.0, "value": 5.0}]  # >max
    f.write_text(json.dumps(attrs))
    p = DebugParams.from_json(f)
    assert p["kp"] == 2.5
    assert p["kd"] == 1.0                      # clamped like a slider
    p["kp"] = -3.0
    assert p["kp"] == 0.0                      # set() clamps too
    out = tmp_path / "saved.json"
    p.save(out)
    assert DebugParams.from_json(out).values() == p.values()

    # live reload: edit the backing file while "running"
    attrs[0]["value"] = 7.0
    f.write_text(json.dumps(attrs))
    os.utime(f, (time.time() + 2, time.time() + 2))   # force mtime change
    assert p.poll() is True
    assert p["kp"] == 7.0
    # malformed mid-edit content is skipped, old values kept
    f.write_text("{broken")
    os.utime(f, (time.time() + 4, time.time() + 4))
    assert p.poll() is False
    assert p["kp"] == 7.0


def test_savez_loadz_typed_round_trip(tmp_path):
    """utils.io.savez_typed/loadz_typed: bf16 rides as uint16 bit patterns
    with a dtype manifest; strings/ints/bools round-trip as plain arrays;
    archives written before the manifest existed load via the fallback."""
    import jax.numpy as jnp
    import numpy as np
    from mobileposer_tpu.utils.io import loadz_typed, savez_typed

    flat = {
        "w": np.arange(6, dtype=np.float32).reshape(2, 3),
        "bf": jnp.asarray([[1.5, -2.0], [0.25, 3.0]], jnp.bfloat16),
        "flag": np.asarray(True),
        "name": np.asarray("poser"),
        "count": np.asarray(7),
    }
    p = tmp_path / "typed.npz"
    savez_typed(p, flat)
    back = loadz_typed(p)
    assert back["bf"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["bf"], np.float32),
                                  np.asarray(flat["bf"], np.float32))
    np.testing.assert_array_equal(back["w"], flat["w"])
    assert bool(back["flag"]) is True
    assert str(back["name"]) == "poser"
    assert int(back["count"]) == 7

    # legacy (pre-manifest) archive loads through the fallback
    legacy = tmp_path / "legacy.npz"
    np.savez(legacy, w=flat["w"], count=flat["count"])
    back2 = loadz_typed(legacy)
    np.testing.assert_array_equal(back2["w"], flat["w"])
    assert int(back2["count"]) == 7
