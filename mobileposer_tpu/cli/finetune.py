"""Finetune the pose modules on real-IMU data
(reference recipe: finetune.sh — DIP first, then IMUPoser chained).

    python -m mobileposer_tpu.cli.finetune --dataset dip \
        --checkpoint-dir checkpoints/1
    python -m mobileposer_tpu.cli.finetune --dataset imuposer \
        --checkpoint-dir checkpoints/1      # uses finetuned_dip as init

Only `joints` and `poser` are finetuned (translation modules stay frozen,
reference combine_weights.py:27-31 / data.py:83 skip translation data in
finetune mode).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.nn.torch_convert import load_from_npz
from mobileposer_tpu.train import TrainingManager, get_best_checkpoint

FINETUNE_MODULES = ("joints", "poser")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=list(C.datasets.finetune_datasets.keys()))
    parser.add_argument("--checkpoint-dir", required=True,
                        help="base-training run dir with per-module "
                             "checkpoints")
    parser.add_argument("--fast-dev-run", action="store_true")
    parser.add_argument("--concurrent", action="store_true",
                        help="finetune joints+poser together in one jit "
                             "region (TrainingManager.train_all)")
    args = parser.parse_args(argv)

    ckpt_dir = Path(args.checkpoint_dir)
    # IMUPoser finetune chains off the DIP finetune (finetune.sh:10-13)
    init_dir = ckpt_dir / "finetuned_dip" if args.dataset == "imuposer" \
        else ckpt_dir
    out_dir = ckpt_dir / f"finetuned_{args.dataset}"

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    dataset = PoseDataset(fold="train", finetune=args.dataset,
                          body_model=body)
    if len(dataset) == 0:
        raise SystemExit(f"no finetune data for {args.dataset} under "
                         f"{C.paths.eval_dir}")

    mgr = TrainingManager(finetune=args.dataset,
                          fast_dev_run=args.fast_dev_run)
    init = {}
    for name in FINETUNE_MODULES:
        best = get_best_checkpoint(init_dir / name)
        if best is None:
            raise SystemExit(f"no init checkpoint for {name} in "
                             f"{init_dir / name}")
        init[name] = load_from_npz(best)
        print(f"Finetuning {name} from {best}")
    if args.concurrent:
        mgr.train_all(dataset, out_dir, body_model=body,
                      module_names=FINETUNE_MODULES, init_params=init,
                      log_file=str(out_dir / "metrics.jsonl"))
    else:
        for name in FINETUNE_MODULES:
            mgr.train_module(name, dataset, out_dir,
                             init_params=init[name],
                             body_model=body if name == "poser" else None,
                             log_file=str(out_dir / "metrics.jsonl"))
    print(f"Finetuned checkpoints in {out_dir}")


if __name__ == "__main__":
    main()
