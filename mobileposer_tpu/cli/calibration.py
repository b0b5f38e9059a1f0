"""Sensor frontend app: ingest phone/watch/earbud UDP packets, calibrate,
rebroadcast aligned frames (reference CLI: mobileposer/calibration.py, minus
the pygame cube UI).

    python -m mobileposer_tpu.cli.calibration [--log] [--duration 60]
"""

from __future__ import annotations

import argparse

from mobileposer_tpu.stream import SensorFrontend


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", action="store_true",
                        help="print per-device Hz / delay once per second")
    parser.add_argument("--duration", type=float, default=None,
                        help="run for N seconds (default: forever)")
    parser.add_argument("--calibrate-after", type=float, default=None,
                        help="run device mean-orientation calibration after "
                             "N seconds of ingest")
    parser.add_argument("--native", action="store_true",
                        help="use the C++ UDP ingest (GIL-free ring buffers)")
    args = parser.parse_args(argv)

    frontend = SensorFrontend(log=args.log, native=args.native)
    print("Sensor frontend listening on UDP 8001-8005, "
          "rebroadcasting to :7777. Ctrl-C to stop.")
    if args.calibrate_after:
        import threading

        def _cal():
            import time
            time.sleep(args.calibrate_after)
            frontend.calibrate()
            print("calibrated device inertial frames")

        threading.Thread(target=_cal, daemon=True).start()
    try:
        frontend.run(duration=args.duration)
    except KeyboardInterrupt:
        frontend.stop()


if __name__ == "__main__":
    main()
