"""Tests for the streaming layer: quaternion helpers, wire parsing,
calibration math, and the UDP loopback pipeline."""

import socket
import time

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyR

from mobileposer_tpu import config as C
from mobileposer_tpu.stream import quat_np as Q
from mobileposer_tpu.stream import (
    Calibration, DataReceiver, DeviceReplayer, FrameReplayer, IMUSet,
    SensorData, SensorFrontend, compute_device_calibration, compute_smpl2imu,
    decode_frame_packet, encode_packet, encode_rebroadcast,
    identity_calibration, normalize_frames, process_message, sensor2global,
    synthetic_device_stream,
)
from mobileposer_tpu.stream.calibration import DEVICE_TO_MODEL_ORDER


# ---------------------------------------------------------------------------
# quaternion helpers vs scipy oracle
# ---------------------------------------------------------------------------

def _rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_matrix_matches_scipy():
    q = _rand_quats(20)
    np.testing.assert_allclose(Q.quat_to_matrix(q),
                               ScipyR.from_quat(q).as_matrix(), atol=1e-10)


def test_matrix_to_quat_roundtrip():
    q = _rand_quats(20, seed=1)
    m = Q.quat_to_matrix(q)
    q2 = Q.matrix_to_quat(m)
    np.testing.assert_allclose(Q.quat_to_matrix(q2), m, atol=1e-8)


def test_quat_mean_matches_scipy():
    base = ScipyR.from_euler("xyz", [0.3, -0.2, 0.5])
    perturbed = np.stack([
        (base * ScipyR.from_rotvec(v)).as_quat()
        for v in np.random.RandomState(2).normal(0, 0.05, (30, 3))])
    ours = Q.quat_mean(perturbed)
    theirs = ScipyR.from_quat(perturbed).mean().as_quat()
    if theirs[3] < 0:
        theirs = -theirs
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_euler_xyz_matches_scipy():
    q = _rand_quats(20, seed=3)
    np.testing.assert_allclose(Q.euler_xyz_from_quat(q),
                               ScipyR.from_quat(q).as_euler("xyz"), atol=1e-8)
    e = ScipyR.from_quat(q).as_euler("xyz")
    q2 = Q.quat_from_euler_xyz(e)
    np.testing.assert_allclose(Q.quat_to_matrix(q2),
                               ScipyR.from_euler("xyz", e).as_matrix(),
                               atol=1e-8)


# ---------------------------------------------------------------------------
# wire format + sensor data
# ---------------------------------------------------------------------------

def test_process_message_roundtrip():
    acc = np.array([0.1, -0.2, 0.3])
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    pkt = encode_packet("left", "phone", [100.0, 5.0], acc, quat)
    out = process_message(pkt)
    assert out is not None
    _, slot, got_acc, got_ori, ts = out
    assert slot == C.sensor.id_map["Left_phone"]
    np.testing.assert_allclose(got_acc[0], acc, atol=1e-6)
    np.testing.assert_allclose(got_ori[0], quat, atol=1e-6)
    assert ts == [100.0, 5.0]


def test_process_message_rejects_garbage():
    assert process_message(b"") is None
    assert process_message(b"stop") is None
    assert process_message(b"nonsense") is None
    assert process_message(b"left;phone:1 2 3") is None  # wrong field count


def test_sensor_data_update_and_calibrate():
    sd = SensorData()
    rot = ScipyR.from_euler("xyz", [0.2, 0.1, -0.3]).as_quat()
    for i in range(35):
        ts = sd.update(0, np.zeros(3), rot, [100.0 + i, i * 0.03])
    # timestamp re-referencing: ref unix + (sensor_ts - ref sensor_ts)
    np.testing.assert_allclose(ts, 100.0 + 34 * 0.03, atol=1e-9)
    sd.calibrate()
    np.testing.assert_allclose(np.abs(np.dot(sd.calibration_quats[0], rot)),
                               1.0, atol=1e-6)
    # after calibration the device's global orientation is ~identity
    g_ori, g_acc = sensor2global(sd.get_orientation(0), sd.get_acceleration(0),
                                 sd.calibration_quats, 0)
    np.testing.assert_allclose(Q.quat_to_matrix(g_ori), np.eye(3), atol=1e-6)


# ---------------------------------------------------------------------------
# calibration math
# ---------------------------------------------------------------------------

def test_tpose_calibration_identity():
    """At the exact T-pose measurement, bones must come out identity and
    accelerations zero (live_demo.py:165-174 semantics)."""
    rng = np.random.RandomState(0)
    ref_q_xyzw = ScipyR.from_euler("xyz", [0.1, 0.4, -0.2]).as_quat()
    smpl2imu = compute_smpl2imu(ref_q_xyzw[[3, 0, 1, 2]])
    tpose_q_xyzw = ScipyR.from_euler(
        "xyz", rng.uniform(-1, 1, (5, 3))).as_quat()
    tpose_q_wxyz = tpose_q_xyzw[:, [3, 0, 1, 2]]
    tpose_acc = rng.normal(0, 1, (5, 3))
    cal = compute_device_calibration(smpl2imu, tpose_q_wxyz, tpose_acc)

    imu60 = normalize_frames(cal, tpose_q_wxyz[None], tpose_acc[None],
                             combo="lw_rp")[0]
    acc = imu60[:15].reshape(5, 3)
    ori = imu60[15:].reshape(5, 3, 3)
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)
    for slot in C.COMBOS["lw_rp"]:
        np.testing.assert_allclose(ori[slot], np.eye(3), atol=1e-6)
    # non-combo slots are zero-masked
    for slot in set(range(5)) - set(C.COMBOS["lw_rp"]):
        np.testing.assert_allclose(ori[slot], 0.0, atol=1e-12)


def test_calibration_save_load(tmp_path):
    cal = identity_calibration()
    cal.save(tmp_path / "cal.npz")
    cal2 = Calibration.load(tmp_path / "cal.npz")
    np.testing.assert_array_equal(cal.smpl2imu, cal2.smpl2imu)


# ---------------------------------------------------------------------------
# UDP loopback pipeline
# ---------------------------------------------------------------------------

def _free_ports(n):
    socks, ports = [], []
    for _ in range(n):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def test_frontend_loopback_pipeline():
    """Raw packets -> SensorFrontend -> :out -> IMUSet frames."""
    ports = _free_ports(6)
    in_ports, out_port = ports[:5], ports[5]
    frontend = SensorFrontend(host="127.0.0.1", ports=in_ports,
                              out_addr=("127.0.0.1", out_port))
    imu_set = IMUSet(imu_host="127.0.0.1", imu_port=out_port, buffer_len=8)
    imu_set.start_reading()
    frontend.receiver.start()
    replayer = DeviceReplayer(ports=in_ports)
    try:
        stream = list(synthetic_device_stream(n_frames=30))
        sent = 0
        deadline = time.time() + 5.0
        for slot, pkt in stream:
            replayer.send(slot, pkt)
            sent += 1
            # drain frontend
            while frontend.step(timeout=0.01):
                pass
            if time.time() > deadline:
                break
        time.sleep(0.2)
        quat, acc = imu_set.get_current_buffer()
    finally:
        frontend.receiver.stop()
        imu_set.stop_reading()
    assert quat.shape[0] >= 1, "no frames made it through the pipeline"
    assert quat.shape[1:] == (5, 4)
    assert acc.shape[1:] == (5, 3)


def test_frame_replayer_to_imuset():
    [port] = _free_ports(1)
    imu_set = IMUSet(imu_host="127.0.0.1", imu_port=port, buffer_len=4)
    imu_set.start_reading()
    rep = FrameReplayer(port=port)
    try:
        acc = np.zeros((6, 5, 3))
        quat = np.tile(np.array([0.0, 0, 0, 1.0]), (6, 5, 1))
        rep.replay(acc, quat, fps=200)
        time.sleep(0.3)
        q, a = imu_set.get_current_buffer()
    finally:
        imu_set.stop_reading()
    assert q.shape[0] >= 1
    # frontend reorders xyzw->wxyz on the wire; identity quat -> [1,0,0,0]
    np.testing.assert_allclose(q[-1, 0], [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(a[-1], 0.0, atol=1e-6)


def test_performance_logger():
    from mobileposer_tpu.stream import PerformanceLogger
    pl = PerformanceLogger(num_devices=2, log_interval=0.0)
    pl.update(0, 0.01)
    pl.update(0, 0.03)
    snap = pl.snapshot()
    np.testing.assert_allclose(snap[0][1], 0.02, atol=1e-9)
    assert snap[1][0] == 0.0


# ---------------------------------------------------------------------------
# Pacer: absolute-deadline pacing (stream/pacing.py)
# ---------------------------------------------------------------------------

class _FakeTime:
    """Deterministic clock whose sleep overshoots like a loaded host."""

    def __init__(self, overshoot: float = 0.0):
        self.t = 0.0
        self.overshoot = overshoot

    def clock(self):
        return self.t

    def sleep(self, d):
        assert d >= 0
        self.t += d + self.overshoot


def test_pacer_absorbs_sleep_overshoot():
    # 30 Hz, 8 ms of work per tick, every sleep overshoots by 3 ms.
    # Relative pacing would run at 1/(period+3ms) = 27.5 Hz; absolute
    # deadlines keep the schedule: N ticks in ~N periods.
    from mobileposer_tpu.stream.pacing import Pacer

    ft = _FakeTime(overshoot=0.003)
    period = 1.0 / 30.0
    p = Pacer(period, clock=ft.clock, sleep=ft.sleep)
    n = 200
    for _ in range(n):
        ft.t += 0.008  # the tick's work
        p.wait()
    # one overshoot (the last sleep's) may stick out past the schedule
    assert ft.t <= n * period + 0.004


def test_pacer_no_burst_when_behind():
    # work longer than the period: wait() must not sleep and must not
    # let the loop burst to catch up afterwards
    from mobileposer_tpu.stream.pacing import Pacer

    ft = _FakeTime()
    period = 0.010
    p = Pacer(period, clock=ft.clock, sleep=ft.sleep)
    ft.t += 0.035  # 3.5 periods of work
    before = ft.t
    p.wait()
    assert ft.t == before  # no sleep while behind
    # schedule realigned: the NEXT wait after fast work sleeps a full
    # remaining slot instead of returning immediately 3 more times
    ft.t += 0.001
    p.wait()
    assert ft.t == before + period


def test_pacer_rejects_nonpositive_period():
    from mobileposer_tpu.stream.pacing import Pacer
    import pytest

    with pytest.raises(ValueError):
        Pacer(0.0)
