"""Evaluate a trained model (reference CLI: mobileposer/evaluate.py:110-126).

    python -m mobileposer_tpu.cli.evaluate --model weights.npz --dataset dip
        [--combo lw_rp] [--online] [--tran]
"""

from __future__ import annotations

import argparse

from mobileposer_tpu import config as C
from mobileposer_tpu.data import EvalSequence, PoseDataset
from mobileposer_tpu.evaluation import evaluate_pose
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.models.utils import load_model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        help="combined weights (.npz or torch checkpoint)")
    parser.add_argument("--dataset", default="dip",
                        choices=list(C.datasets.test_datasets.keys())
                        + ["synthetic"],
                        help="'synthetic' evaluates against the fixture "
                             "written by `process --dataset synthetic` — "
                             "the blob-free end-to-end recipe check")
    parser.add_argument("--combo", default="lw_rp",
                        choices=list(C.COMBOS.keys()))
    parser.add_argument("--online", action="store_true",
                        help="also run frame-by-frame streaming eval "
                             "(or set ONLINE=1, reference-style)")
    parser.add_argument("--tran", action="store_true",
                        help="report translation drift at 1-7 m")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the evaluation batches over all local "
                             "devices (evaluate_pose(mesh=...); metrics "
                             "equal single-device to <=1e-4)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 inference dtype (+16%% eval throughput "
                             "on v5e-1; metrics computed f32 on cast-back "
                             "outputs — parity runs should stay f32)")
    parser.add_argument("--online-mode", default="exact",
                        choices=["exact", "carry"],
                        help="run the ONLINE protocol through exact window "
                             "semantics or carry-mode streaming — the "
                             "parity-day A/B for the approximation's "
                             "accuracy cost (models/streaming.py)")
    parser.add_argument("--int8", action="store_true",
                        help="evaluate on W8A8-quantized LSTM matmuls "
                             "(ops/quant.py) — scores what an int8 "
                             "deployment would serve; composes with "
                             "--bf16 and both --online-mode values")
    args = parser.parse_args(argv)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    params = load_model(args.model)
    if args.int8:
        from mobileposer_tpu.ops.quant import quantize_params_int8
        if args.bf16:
            # match the serving order: cast first so dequant scales stay
            # f32 and linears/state run bf16 (stream/server.py)
            import jax.numpy as jnp

            from mobileposer_tpu.nn import cast_params
            params = cast_params(params, jnp.bfloat16)
        params = quantize_params_int8(params)
    net = MobilePoserNet(body)
    if args.dataset == "synthetic":
        fixture = C.paths.processed_datasets / "synthetic.pt"
        if not fixture.exists():
            raise SystemExit(
                f"{fixture} not found — run "
                f"`python -m mobileposer_tpu.cli.process --dataset "
                f"synthetic` first")
        ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                         data_files=[fixture])
    else:
        ds = PoseDataset(fold="test", evaluate=args.dataset, body_model=body)
    view = EvalSequence(ds, combo=args.combo)
    from mobileposer_tpu.utils.helpers import getenv_flag
    mesh = None
    if args.data_parallel:
        import jax

        from mobileposer_tpu.parallel import make_mesh
        if len(jax.devices()) > 1:
            mesh = make_mesh()
            print(f"data-parallel evaluation over {mesh.devices.size} "
                  f"devices")
    evaluate_pose(net, params, view,
                  online=args.online or getenv_flag("ONLINE"),
                  evaluate_tran=args.tran,
                  online_mode=args.online_mode,
                  bf16=args.bf16,
                  mesh=mesh)


if __name__ == "__main__":
    main()
