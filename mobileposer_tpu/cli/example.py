"""Run the model over a dataset sequence and export the motion
(reference CLI: mobileposer/example.py + viewers).

    python -m mobileposer_tpu.cli.example --model weights.npz --dataset dip
        [--seq-num 0] [--combo lw_rp] [--online] [--out saved_motions/]

Instead of an OpenGL viewer the motion is exported as pose.txt / tran.txt
(Unity-compatible, reference model.py:41-75) plus an .npz with all outputs.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.data import EvalSequence, PoseDataset
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.models.utils import load_model


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--dataset", default="dip")
    parser.add_argument("--seq-num", type=int, default=0)
    parser.add_argument("--combo", default="lw_rp",
                        choices=list(C.COMBOS.keys()))
    parser.add_argument("--online", action="store_true")
    parser.add_argument("--out", default="saved_motions")
    args = parser.parse_args(argv)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    params = load_model(args.model)
    net = MobilePoserNet(body)
    ds = PoseDataset(fold="test", evaluate=args.dataset, body_model=body)
    view = EvalSequence(ds, combo=args.combo)
    imu, pose_t, joints_t, tran_t = view[args.seq_num]

    if args.online:
        step = jax.jit(net.forward_online)
        state = net.init_online_state()
        poses, trans = [], []
        for frame in imu:
            (p, j, t, c), state = step(params, state, jnp.asarray(frame))
            poses.append(np.asarray(p))
            trans.append(np.asarray(t))
        pose_p, tran_p = np.stack(poses), np.stack(trans)
    else:
        pose_p, joints_p, tran_p, _ = jax.jit(net.forward_offline)(
            params, jnp.asarray(imu))
        pose_p, tran_p = np.asarray(pose_p), np.asarray(tran_p)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    body.save_unity_motion(pose_p, tran_p, output_dir=str(out))
    np.savez(out / f"example_{args.dataset}_{args.seq_num}.npz",
             pose_p=pose_p, tran_p=tran_p, pose_t=pose_t, tran_t=tran_t)
    print(f"Motion exported to {out}/")


if __name__ == "__main__":
    main()
