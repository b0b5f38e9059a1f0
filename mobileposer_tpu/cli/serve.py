"""Run the multi-stream pose inference server.

    python -m mobileposer_tpu.cli.serve --model weights.npz
        [--port 9000] [--max-streams 64] [--tick-hz 30]
"""

from __future__ import annotations

import argparse

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.models.utils import load_model
from mobileposer_tpu.stream import PoseServer


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=9000)
    parser.add_argument("--max-streams", type=int, default=64)
    parser.add_argument("--tick-hz", type=float, default=30.0)
    parser.add_argument("--duration", type=float, default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="serve with bfloat16 weights (2x MXU, ~1e-3 "
                             "relative error)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the stream slots over all local "
                             "devices (params replicated; replies are "
                             "equal to single-device to <=1e-4)")
    parser.add_argument("--carry", action="store_true",
                        help="carry-mode streaming (models/streaming.py): "
                             "~4.5x throughput, approximate window "
                             "semantics — validate on real checkpoints "
                             "first (docs/parity.md)")
    parser.add_argument("--int8", action="store_true",
                        help="W8A8-quantize the LSTM matmuls onto the "
                             "MXU's double-rate int8 path (ops/quant.py; "
                             "works in exact and carry modes — opt-in, "
                             "accuracy-labelled like carry mode itself)")
    parser.add_argument("--wire", default="f32", choices=["f32", "f16"],
                        help="reply wire format: f16 halves reply bytes "
                             "(pose/contact as half floats, translation "
                             "stays f32; ~0.03 deg worst-case rounding) "
                             "AND the device->host reply fetch — use when "
                             "reply bandwidth, not compute, caps stream "
                             "count (docs/deploy.md #2). Clients must "
                             "pass the matching wire= to PoseClient")
    parser.add_argument("--fetch-workers", type=int, default=1,
                        help="pipelined reply-fetcher threads. One worker "
                             "pays a device->host round trip per tick "
                             "serially (~1/RTT ticks/s ceiling on remote "
                             "devices); workers overlap the round trips, "
                             "and per-stream freshness is preserved (a "
                             "tick fetched after a newer one was sent is "
                             "dropped whole, never delivered stale)")
    parser.add_argument("--no-pipeline", action="store_true",
                        help="synchronous ticks (reply fetched inline). "
                             "Default is the pipelined tick: reply "
                             "transport overlaps the next tick's compute, "
                             "which is what sustains 30 Hz on tunneled "
                             "hosts (the inline fetch alone costs ~30 ms "
                             "against the 33.3 ms budget); replies carry "
                             "identical content one tick later")
    args = parser.parse_args(argv)
    # serving cold-start is compile-bound; repeat deploys on the same host
    # hit the persistent cache (measured 3.4 s cold vs 2.7 s warm —
    # serving.py module docstring)
    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    net = MobilePoserNet(body)
    params = load_model(args.model)
    if args.bf16:
        import jax.numpy as jnp
        from mobileposer_tpu.nn import cast_params
        params = cast_params(params, jnp.bfloat16)
    mesh = None
    if args.data_parallel:
        import jax

        from mobileposer_tpu.parallel import make_mesh
        if len(jax.devices()) > 1:
            mesh = make_mesh()
            if args.max_streams % mesh.devices.size:
                parser.error(f"--max-streams {args.max_streams} must divide "
                             f"over {mesh.devices.size} devices")
    server = PoseServer(net, params, host=args.host, port=args.port,
                        max_streams=args.max_streams, tick_hz=args.tick_hz,
                        mode="carry" if args.carry else "exact", mesh=mesh,
                        pipelined=not args.no_pipeline,
                        quantize="int8" if args.int8 else None,
                        wire=args.wire, fetch_workers=args.fetch_workers)
    print(f"Pose server on udp://{args.host}:{server.port} "
          f"({args.max_streams} streams @ {args.tick_hz} Hz, "
          f"{server.mode} mode"
          + (", int8" if args.int8 else "")
          + (", f16 wire" if args.wire == "f16" else "")
          + (", pipelined" if server.pipelined else ", synchronous")
          + (f", {mesh.devices.size}-device fleet" if mesh is not None
             else "") + "). Ctrl-C to stop.")
    try:
        server.run(duration=args.duration)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
        server.close()
        import json
        print("\n" + json.dumps(server.stats()))


if __name__ == "__main__":
    main()
