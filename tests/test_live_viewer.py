"""Live pygame viewers (viz/live_viewer.py) under the SDL dummy driver.

Exercises the reference's interactive surfaces — skeleton window
(smpl_viewer.py:23-43) and orientation cubes (visualizer.py:96-245) —
headlessly: SDL_VIDEODRIVER=dummy gives a real drawable surface without a
display, so the drawing paths (projection, bone lines, cube wireframes,
pred-vs-GT layout) run for real and the pixel buffer is assertable.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
pygame = pytest.importorskip("pygame")

from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.viz.live_viewer import (LiveSkeletonViewer,
                                             OrientationCubeViewer)


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=48)


def _tpose_joints(body):
    j, _ = body.get_zero_pose_joint_and_vertex()
    return np.asarray(j, np.float32)


def test_skeleton_viewer_draws(body):
    v = LiveSkeletonViewer(body, size=(320, 240))
    try:
        v.update(_tpose_joints(body))
        px = v.pixels()
        assert px.shape == (320, 240, 3)
        assert px.sum() > 0, "nothing drawn"
        assert v.frames_drawn == 1
    finally:
        v.close()


def test_skeleton_viewer_pred_vs_gt(body):
    """Side-by-side layout: GT skeleton adds strokes in its own color, so
    the frame has strictly more non-background pixels than pred alone."""
    v = LiveSkeletonViewer(body, size=(320, 240))
    try:
        j = _tpose_joints(body)
        v.update(j)
        solo = int((v.pixels().sum(axis=2) > 60).sum())
        v.update(j, joints_gt=j + np.array([0.0, 0.05, 0.0], np.float32))
        both = int((v.pixels().sum(axis=2) > 60).sum())
        assert both > solo
    finally:
        v.close()


def test_skeleton_viewer_on_frame_adapter(body):
    v = LiveSkeletonViewer(body, size=(200, 160))
    try:
        joints = _tpose_joints(body) + 0.3      # un-centered, like outputs
        v.on_frame(None, joints, None, None)
        assert v.frames_drawn == 1
    finally:
        v.close()


def test_orientation_cubes_draw_and_rotate():
    v = OrientationCubeViewer(n_devices=5, size=(500, 150))
    try:
        eye = np.tile(np.eye(3, dtype=np.float32), (5, 1, 1))
        v.update(eye, accelerations=np.ones((5, 3)) * 3.0)
        a = v.pixels().copy()
        ang = np.deg2rad(40.0)
        rot = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                        [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        v.update(np.tile(rot, (5, 1, 1)))
        b = v.pixels()
        assert a.sum() > 0 and b.sum() > 0
        assert (a != b).any(), "rotation did not change the rendering"
    finally:
        v.close()


def test_orientation_cubes_sensor_data_adapter():
    from mobileposer_tpu.stream.sensor import SensorData
    v = OrientationCubeViewer(n_devices=5, size=(500, 150))
    try:
        v.render_sensor_data(SensorData())
        assert v.frames_drawn == 1
        assert v.pixels().sum() > 0
    finally:
        v.close()


def test_play_motion_and_render_cli_live(body, tmp_path, capsys):
    """play() shows a whole sequence; `cli/render --live` drives it from a
    MotionDump bundle (pred + GT side by side)."""
    from mobileposer_tpu.viz.live_viewer import LiveSkeletonViewer
    j = _tpose_joints(body)
    seq = np.stack([j + np.array([0, 0.01 * t, 0], np.float32)
                    for t in range(4)])
    v = LiveSkeletonViewer(body, size=(200, 160))
    try:
        assert v.play(seq, fps=1000) == 4
    finally:
        v.close()

    eye = np.tile(np.eye(3, dtype=np.float32), (4, 24, 1, 1))
    bundle = tmp_path / "view.npz"
    np.savez(bundle, pose_p=eye, pose_t=eye,
             tran_p=np.zeros((4, 3), np.float32),
             tran_t=np.zeros((4, 3), np.float32))
    import mobileposer_tpu.kinematics.smpl as smpl_mod
    import unittest.mock as mock
    from mobileposer_tpu.cli import render as render_cli
    with mock.patch.object(
            smpl_mod.ParametricModel, "from_file_or_synthetic",
            classmethod(lambda cls, f, **kw: body)):
        render_cli.main([str(bundle), "--live", "--fps", "1000"])
    assert "played 4 frames" in capsys.readouterr().out


def test_world_space_layout_keeps_offset_gt_visible(body):
    """MotionDump bundles bake a +1 m GT world offset; split_layout=False
    must render both bodies in one camera so the GT stays on-screen
    (review r3: the split layout added a second screen offset and pushed
    GT past the window edge)."""
    v = LiveSkeletonViewer(body, size=(720, 540), split_layout=False)
    try:
        j = _tpose_joints(body)
        gt = j + np.array([1.0, 0.0, 0.0], np.float32)
        v.update(j, joints_gt=gt)
        px = v.pixels()          # [W, H, 3]
        # GT strokes use the orange color (255,160,60): red-dominant
        orange = ((px[..., 0] > 180) & (px[..., 1] > 100)
                  & (px[..., 1] < 220) & (px[..., 2] < 120))
        assert orange.sum() > 50, "GT skeleton not visible in-window"
    finally:
        v.close()
