"""Export an AOT-compiled serving bundle (StableHLO via jax.export).

    python -m mobileposer_tpu.cli.export_serving --out bundle/
        [--model weights.npz] [--streams 256]
        [--mode carry|exact|offline] [--seq-len 512]
        [--bf16] [--platforms tpu[,cpu]] [--smoke-test]

The bundle (step.jaxexport + weights.npz + state.npz + meta.json) runs on
a serving host without tracing or compiling the model code — see
mobileposer_tpu/serving.py. Without --model, randomly initialized weights
are exported (pipeline smoke tests).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True, help="bundle directory")
    parser.add_argument("--model", default=None,
                        help="weights .npz (default: random init)")
    parser.add_argument("--streams", type=int, default=256)
    parser.add_argument("--mode", choices=["carry", "exact", "offline"],
                        default="carry",
                        help="streaming step (carry/exact) or the "
                             "stateless batched offline forward")
    parser.add_argument("--seq-len", type=int, default=512,
                        help="padded sequence length (offline mode)")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="bake the W8A8 program into the artifact "
                             "(int8 kernels ship in the weights npz, 4x "
                             "smaller; exact/offline artifacts embed the "
                             "int8 Pallas window kernels)")
    parser.add_argument("--platforms", default="tpu",
                        help="comma-separated lowering targets (each extra "
                             "platform ~doubles export time; add cpu only "
                             "for local smoke tests of the same artifact)")
    parser.add_argument("--smoke-test", action="store_true",
                        help="reload the bundle and run one step")
    args = parser.parse_args(argv)
    import jax
    import jax.numpy as jnp

    from mobileposer_tpu import config as C
    from mobileposer_tpu.kinematics.smpl import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.models.utils import load_model
    from mobileposer_tpu.serving import load_bundle, save_bundle

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    net = MobilePoserNet(body)
    params = (load_model(args.model) if args.model
              else init_all_modules(jax.random.PRNGKey(0)))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.bf16:
        from mobileposer_tpu.nn import cast_params
        params = cast_params(params, dtype)

    out = save_bundle(args.out, net, params, n_streams=args.streams,
                      mode=args.mode, dtype=dtype,
                      platforms=tuple(args.platforms.split(",")),
                      seq_len=args.seq_len,
                      quantize="int8" if args.int8 else None)
    print(f"exported {args.mode} step (S={args.streams}, "
          f"{jnp.dtype(dtype).name}"
          + (", int8 LSTM kernels" if args.int8 else "") + f") -> {out}")

    if args.smoke_test:
        step, p, st, meta = load_bundle(out)
        np_dtype = np.dtype(str(jnp.dtype(dtype)))
        if args.mode == "offline":
            imu = np.zeros((args.streams, args.seq_len, 60), np_dtype)
            lengths = np.full((args.streams,), args.seq_len, np.int32)
            pose, joints, tran, contact = step(p, imu, lengths)
        else:
            frames = np.zeros((args.streams, 60), np_dtype)
            (pose, joints, tran, contact), _ = step(p, st, frames)
        assert np.isfinite(np.asarray(pose, np.float32)).all()
        print(f"smoke test ok: pose {pose.shape}, tran {tran.shape} "
              f"on {jax.default_backend()}")


if __name__ == "__main__":
    main()
