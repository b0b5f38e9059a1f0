"""Live pose estimation from streamed IMUs
(reference CLI: mobileposer/live_demo.py:146-290).

    python -m mobileposer_tpu.cli.live_demo --model weights.npz
        [--vis] [--save] [--combo lw_rp] [--calibration cal.npz]
"""

from __future__ import annotations

import argparse
import time

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.models.utils import load_model
from mobileposer_tpu.stream import (
    Calibration, IMUSet, LivePoser, UnityExporter, save_session)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--vis", action="store_true",
                        help="stream pose to a Unity viewer on TCP :8889")
    parser.add_argument("--local-vis", action="store_true",
                        help="open a local pygame skeleton window "
                             "(viz/live_viewer.py — reference "
                             "smpl_viewer.py equivalent, no GL needed)")
    parser.add_argument("--save", action="store_true",
                        help="record the session to dev data")
    parser.add_argument("--combo", default="lw_rp",
                        choices=list(C.COMBOS.keys()))
    parser.add_argument("--calibration", default=None,
                        help="load a saved calibration .npz instead of the "
                             "interactive procedure")
    parser.add_argument("--duration", type=float, default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    # first-frame latency is compile-bound; repeat sessions on the same
    # host hit the persistent cache
    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    net = MobilePoserNet(body)
    params = load_model(args.model)
    poser = LivePoser(net, params, imu_set=IMUSet(buffer_len=1),
                      combo=args.combo)

    if args.calibration:
        poser.set_calibration(Calibration.load(args.calibration))
    else:
        input("Put IMU 1 aligned with your body reference frame "
              "(x = Left, y = Up, z = Forward) and press Enter.")
        print("Keep for 3 seconds ...", end="", flush=True)
        poser.calibrate_body_frame()
        input("\tDone.\nWear all IMUs correctly and press Enter.")
        for i in range(3, 0, -1):
            print(f"\rStand in T-pose. Calibration begins in {i} s.",
                  end="", flush=True)
            time.sleep(1)
        print("\nHold the T-pose for 3 seconds ...", end="", flush=True)
        cal = poser.calibrate_tpose()
        cal.save("calibration.npz")
        print("\tDone (saved to calibration.npz).")

    unity = None
    if args.vis:
        unity = UnityExporter()
        print("Waiting for Unity viewer to connect on :8889 ...")
        unity.accept()
    viewer = None
    if args.local_vis:
        from mobileposer_tpu.viz.live_viewer import LiveSkeletonViewer
        viewer = LiveSkeletonViewer(body)

    print("Estimating poses. Ctrl-C to stop.")
    try:
        recorded = poser.run(duration=args.duration, unity=unity,
                             on_frame=viewer.on_frame if viewer else None,
                             record=args.save, debug=args.debug)
    except KeyboardInterrupt:
        # interrupt escaped run() (rare window): salvage the live buffers
        from mobileposer_tpu.stream.live import stack_recording
        live = getattr(poser, "last_recording", None)
        recorded = stack_recording(live) if live else None
    finally:
        if unity is not None:
            unity.close()
        if viewer is not None:
            viewer.close()
    if args.save and recorded:
        path = save_session(recorded, poser.calibration)
        print(f"Session saved to {path}")


if __name__ == "__main__":
    main()
