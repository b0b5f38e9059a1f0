"""Render a MotionDump npz bundle to PNG frames / GIF (headless equivalent
of the reference's live viewer, smpl_viewer.py:23-43).

    python -m mobileposer_tpu.cli.render saved_motions/view.npz \
        --out render_out [--stride 5] [--gif]
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
    args = parser.parse_args(argv)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    out = render_motion(args.bundle, args.out, body=body,
                        stride=args.stride, gif=args.gif)
    print(f"rendered to {out}")


if __name__ == "__main__":
    main()
