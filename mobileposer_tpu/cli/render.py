"""Render a MotionDump npz bundle to PNG frames / GIF, or play it in a
live pygame window (reference viewer, smpl_viewer.py:23-43).

    python -m mobileposer_tpu.cli.render saved_motions/view.npz \
        --out render_out [--stride 5] [--gif] [--live [--fps 30]]
"""

from __future__ import annotations

import argparse

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.viz.render import render_motion


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("bundle", help="npz written by SMPLViewer.view / "
                                       "MotionDump.save_npz")
    parser.add_argument("--out", default="render_out")
    parser.add_argument("--stride", type=int, default=5,
                        help="render every Nth frame")
    parser.add_argument("--gif", action="store_true",
                        help="also assemble an animated GIF")
    parser.add_argument("--live", action="store_true",
                        help="play in a pygame window instead of writing "
                             "files (pred-vs-GT side by side when the "
                             "bundle has ground truth)")
    parser.add_argument("--fps", type=int, default=30)
    args = parser.parse_args(argv)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    if args.live:
        from mobileposer_tpu.viz.live_viewer import LiveSkeletonViewer
        from mobileposer_tpu.viz.render import load_bundle_joints
        _, joints_p, joints_t = load_bundle_joints(args.bundle, body)
        # world-space joints: the bundle bakes the GT +x offset, so use the
        # shared-camera layout (a second screen offset pushes GT off-window)
        viewer = LiveSkeletonViewer(body, split_layout=False)
        try:
            shown = viewer.play(joints_p, fps=args.fps,
                                joints_gt_seq=joints_t)
        finally:
            viewer.close()
        print(f"played {shown} frames")
        return
    out = render_motion(args.bundle, args.out, body=body,
                        stride=args.stride, gif=args.gif)
    print(f"rendered to {out}")


if __name__ == "__main__":
    main()
