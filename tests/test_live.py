"""End-to-end live pipeline: fake frames -> calibration -> jitted streaming
model -> poses, over real loopback sockets."""

import socket
import threading
import time

import numpy as np
import pytest

import jax

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MobilePoserNet, init_all_modules
from mobileposer_tpu.stream import (
    FrameReplayer, IMUSet, LivePoser, identity_calibration,
)


def _free_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_live_poser_loopback():
    port = _free_port()
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    poser = LivePoser(net, params,
                      imu_set=IMUSet(imu_host="127.0.0.1", imu_port=port,
                                     buffer_len=2))
    poser.set_calibration(identity_calibration())

    T = 12
    rng = np.random.RandomState(0)
    acc = rng.normal(0, 0.05, (T, 5, 3))
    quat = np.tile(np.array([0.0, 0, 0, 1.0]), (T, 5, 1))

    rep = FrameReplayer(port=port)
    sender = threading.Thread(
        target=lambda: (time.sleep(0.3), rep.replay(acc, quat, fps=60)),
        daemon=True)
    sender.start()

    frames = []
    poser.run(duration=2.0, fps=60,
              on_frame=lambda p, j, t, c: frames.append(
                  (np.asarray(p), np.asarray(t))))
    sender.join()
    assert len(frames) >= 1, "live loop produced no frames"
    pose, tran = frames[-1]
    assert pose.shape == (24, 3, 3)
    assert tran.shape == (3,)
    assert np.all(np.isfinite(pose)) and np.all(np.isfinite(tran))


def test_model_utils():
    import jax.numpy as jnp
    from mobileposer_tpu.models.utils import (
        normalize_and_concat, reduced_pose_to_full, smooth_avg)
    # reduced_pose_to_full puts identity at ignored joints
    B, S = 1, 2
    reduced = np.tile(np.eye(3, dtype=np.float32), (B, S, 16, 1, 1))
    full = np.asarray(reduced_pose_to_full(
        jnp.asarray(reduced.reshape(B, S, -1)))).reshape(B, S, 24, 3, 3)
    np.testing.assert_allclose(full[0, 0, 7], np.eye(3))
    # smooth_avg: interior value is the true mean of the window
    x = jnp.asarray(np.arange(10, dtype=np.float32)[:, None])
    sm = np.asarray(smooth_avg(x, s=3))
    np.testing.assert_allclose(sm[5, 0], 5.0)
    np.testing.assert_allclose(sm[0, 0], 0.5)   # boundary: mean of [0, 1]
    # normalize_and_concat output shape [N, 72]
    out = normalize_and_concat(jnp.zeros((4, 6, 3)), jnp.broadcast_to(
        jnp.eye(3), (4, 6, 3, 3)))
    assert out.shape == (4, 72)


def test_live_recording_schema():
    """record=True must produce the reference dev-data schema: calibrated
    global rotation matrices + accels (device order) plus raw wire values."""
    port = _free_port()
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(0))
    poser = LivePoser(net, params,
                      imu_set=IMUSet(imu_host="127.0.0.1", imu_port=port,
                                     buffer_len=2))
    poser.set_calibration(identity_calibration())
    T = 8
    rng = np.random.RandomState(1)
    acc = rng.normal(0, 0.05, (T, 5, 3))
    quat = np.tile(np.array([0.0, 0, 0, 1.0]), (T, 5, 1))
    rep = FrameReplayer(port=port)
    sender = threading.Thread(
        target=lambda: (time.sleep(0.3), rep.replay(acc, quat, fps=60)),
        daemon=True)
    sender.start()
    recorded = poser.run(duration=2.0, fps=60, record=True)
    sender.join()
    assert recorded is not None and recorded["pose"].shape[0] >= 1
    n = recorded["pose"].shape[0]
    assert recorded["acc"].shape == (n, 5, 3)      # calibrated global accel
    assert recorded["ori"].shape == (n, 5, 3, 3)   # calibrated rotmats
    assert recorded["raw_ori"].shape == (n, 5, 4)  # wire quats
    assert recorded["pose"].shape == (n, 24, 3, 3)
    # with identity calibration, glb_ori equals the raw orientation matrix:
    # identity quats -> identity matrices
    np.testing.assert_allclose(recorded["ori"][0, 0], np.eye(3), atol=1e-6)
