"""Live streaming runtime: calibration procedure + 30 Hz inference loop.

Behavioral parity target: reference `mobileposer/live_demo.py:146-264`. The
interactive prompts become explicit methods so the same runtime drives real
sensors, the fake replayer, and headless benchmarks; the model step is the
jitted pure `forward_online` (models/net.py) instead of a stateful module.

Output side: optional Unity TCP export (pose axis-angle '#' tran '$',
reference live_demo.py:256-260) and session recording in the reference's
dev-data schema (live_demo.py:266-280).
"""

from __future__ import annotations

import socket
import time
from pathlib import Path
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.stream.calibration import (
    Calibration, compute_device_calibration, compute_smpl2imu, normalize_frames)
from mobileposer_tpu.stream.imuset import Clock, IMUSet


def stack_recording(recorded: dict) -> dict:
    """Stack per-frame recording lists into arrays (tolerates live dicts
    salvaged mid-run)."""
    return {k: np.stack(v) if v else np.zeros(0)
            for k, v in recorded.items()}


class UnityExporter:
    """TCP server streaming pose+tran strings to a Unity viewer
    (reference: live_demo.py:185-190, 256-260)."""

    def __init__(self, host: str = "0.0.0.0", port: int = 8889):
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind((host, port))
        self.server.listen(1)
        self.conn = None

    def accept(self) -> None:
        self.conn, _ = self.server.accept()

    def send(self, pose_aa: np.ndarray, tran: np.ndarray) -> None:
        if self.conn is None:
            return
        s = ",".join("%g" % v for v in pose_aa.flatten()) + "#" + \
            ",".join("%g" % v for v in tran.flatten()) + "$"
        self.conn.send(s.encode("utf8"))

    def close(self) -> None:
        if self.conn is not None:
            self.conn.close()
        self.server.close()


class LivePoser:
    """End-to-end streaming estimator."""

    def __init__(self, net: MobilePoserNet, params: dict,
                 imu_set: Optional[IMUSet] = None, combo: str = "lw_rp"):
        self.net = net
        # ONE batched placement: weights loaded from disk are numpy, and a
        # numpy pytree passed to the jitted step re-uploads every leaf on
        # every FRAME (CLAUDE.md transfer-batching rule)
        self.params = jax.device_put(params)
        self.imu_set = imu_set or IMUSet(buffer_len=1)
        self.combo = combo
        self.calibration: Optional[Calibration] = None
        self._step = jax.jit(net.forward_online)
        self._state = net.init_online_state()
        self._aa = jax.jit(
            lambda p: R.rotation_matrix_to_axis_angle(p).reshape(72))

    # -- calibration (reference: live_demo.py:159-174) ---------------------
    def calibrate_body_frame(self, num_seconds: float = 3.0) -> np.ndarray:
        """Step 1: reference IMU held aligned with the body frame."""
        oris, _ = self.imu_set.get_mean_measurement_of_n_second(
            num_seconds=num_seconds, buffer_len=40)
        self._smpl2imu = compute_smpl2imu(oris[0])
        return self._smpl2imu

    def calibrate_tpose(self, num_seconds: float = 3.0) -> Calibration:
        """Step 2: all devices worn, subject in T-pose."""
        oris, accs = self.imu_set.get_mean_measurement_of_n_second(
            num_seconds=num_seconds, buffer_len=40)
        self.calibration = compute_device_calibration(
            self._smpl2imu, oris, accs)
        return self.calibration

    def set_calibration(self, cal: Calibration) -> None:
        self.calibration = cal

    def reset(self) -> None:
        self._state = self.net.init_online_state()

    # -- per-frame inference ----------------------------------------------
    def step_frame(self, quat_wxyz5: np.ndarray, acc5: np.ndarray):
        """One raw aligned frame -> (pose [24,3,3], joints, tran [3],
        contact [2])."""
        assert self.calibration is not None, "calibrate first"
        imu60 = normalize_frames(self.calibration, quat_wxyz5[None],
                                 acc5[None], self.combo)[0]
        (pose, joints, tran, contact), self._state = self._step(
            self.params, self._state, jnp.asarray(imu60))
        return pose, joints, tran, contact

    def run(self, duration: Optional[float] = None, fps: int = C.datasets.fps,
            on_frame: Optional[Callable] = None,
            unity: Optional[UnityExporter] = None,
            record: bool = False, debug: bool = False,
            pipelined: bool = True):
        """Main loop (reference: live_demo.py:207-264).

        pipelined=True (default) defers each frame's device->host fetch by
        one tick, exactly like the serving tick (stream/server.py): frame
        N's step is dispatched (async), then frame N-1's already-computed
        results are fetched and delivered to the consumers — the transport
        round trip (~30 ms on tunneled hosts, i.e. the whole 33 ms budget)
        overlaps frame N's compute instead of serializing with it. Content
        is identical one frame later; the final frame is flushed on exit.
        pipelined=False restores the synchronous loop.
        """
        assert self.calibration is not None, "calibrate first"
        from mobileposer_tpu.stream.calibration import calibrate_frames
        self.imu_set.start_reading()
        clock = Clock()
        recorded = ({"acc": [], "ori": [], "raw_acc": [], "raw_ori": [],
                     "pose": [], "tran": []} if record else None)
        # expose the live buffers so callers can salvage a recording when an
        # interrupt escapes run() itself (e.g. lands in stop_reading)
        self.last_recording = recorded

        def deliver(fetched, frame, record_only=False):
            """Send one frame's results to every consumer. Raises
            StopIteration when the viewer asks to close. Recording runs
            FIRST (it cannot raise StopIteration), so a frame whose viewer
            delivery closes the window is still recorded; record_only=True
            skips the viewer/unity delivery entirely (used to flush the
            in-flight pipelined frame when the viewer closes)."""
            quat1, acc1, pose, joints, tran, contact = frame
            if recorded is not None:
                # reference dev-data schema (live_demo.py:266-275):
                # 'acc'/'ori' are CALIBRATED global accel + rotation
                # matrices in device slot order; raw wire values are
                # kept under raw_*
                glb_acc, glb_ori = calibrate_frames(
                    self.calibration, quat1[None], acc1[None])
                recorded["acc"].append(glb_acc[0])
                recorded["ori"].append(glb_ori[0])
                recorded["raw_acc"].append(acc1)
                recorded["raw_ori"].append(quat1)
                recorded["pose"].append(np.asarray(fetched["pose"]))
                recorded["tran"].append(np.asarray(fetched["tran"]))
            if record_only:
                return
            if unity is not None:
                unity.send(np.asarray(fetched["aa"]),
                           np.asarray(fetched["tran"]))
            if on_frame is not None:
                on_frame(pose, fetched["joints"], tran, contact)

        pending = None                       # (need futures, frame snapshot)
        t0 = time.time()
        try:
            while duration is None or time.time() - t0 < duration:
                try:
                    clock.tick(fps)
                    quat, acc = self.imu_set.get_current_buffer()
                    if quat.size == 0:
                        continue
                    pose, joints, tran, contact = self.step_frame(
                        quat[-1], acc[-1])
                    # ONE batched fetch per frame for every host consumer
                    # (unity / viewer / recording): each extra serial
                    # np.asarray costs a transport round trip inside the
                    # 33 ms tick budget
                    need = {}
                    if unity is not None:
                        need["aa"] = self._aa(pose)
                    if unity is not None or recorded is not None:
                        need["tran"] = tran
                    if recorded is not None:
                        need["pose"] = pose
                    if on_frame is not None:
                        need["joints"] = joints
                    frame = (quat[-1], acc[-1], pose, joints, tran, contact)
                    try:
                        if pipelined:
                            # dispatch first, then pay the fetch RTT for the
                            # PREVIOUS frame while this one computes; start
                            # this frame's D2H copy NOW (non-blocking) so
                            # next tick's device_get consumes an
                            # already-issued transfer instead of paying a
                            # fresh request round trip (stream/server.py
                            # does the same for the serving tick)
                            for a in need.values():
                                try:
                                    a.copy_to_host_async()
                                except (AttributeError, RuntimeError):
                                    break
                            prev, pending = pending, (need, frame)
                            if prev is not None:
                                deliver(jax.device_get(prev[0]), prev[1])
                        else:
                            deliver(jax.device_get(need) if need else {},
                                    frame)
                    except StopIteration:
                        # viewer window closed: clean stop — but "recording
                        # keeps every frame" applies to the in-flight
                        # pipelined frame too, so record it without
                        # viewer/unity delivery
                        if pipelined and pending is not None:
                            deliver(jax.device_get(pending[0]), pending[1],
                                    record_only=True)
                        pending = None
                        break
                    if debug:
                        print(f"\rSensor FPS {self.imu_set.clock.get_fps():5.1f}"
                              f"  Output FPS {clock.get_fps():5.1f}", end="")
                except KeyboardInterrupt:
                    break          # stop requested: keep everything recorded
            # flush the deferred final frame so a recording keeps every frame
            if pending is not None:
                try:
                    deliver(jax.device_get(pending[0]), pending[1])
                except StopIteration:
                    pass
        finally:
            self.imu_set.stop_reading()
        if recorded is not None:
            return stack_recording(recorded)
        return None


def save_session(data: dict, calibration: Calibration,
                 out_dir=None) -> Path:
    """Persist a recorded session (reference: live_demo.py:266-280)."""
    out_dir = Path(out_dir or C.paths.dev_data)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"dev_{int(time.time())}.npz"
    np.savez(path, **data, smpl2imu=calibration.smpl2imu,
             device2bone=calibration.device2bone,
             acc_offsets=calibration.acc_offsets)
    return path
