"""Train MobilePoser modules (reference CLI: mobileposer/train.py:116-154).

    python -m mobileposer_tpu.cli.train [--module poser] [--finetune dip]
        [--init-from weights.npz] [--fast-dev-run]
"""

from __future__ import annotations

import argparse
from pathlib import Path

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.kinematics.smpl import ParametricModel
from mobileposer_tpu.train import (
    MODULE_NAMES, TrainingManager, combine_weights, get_checkpoint_path)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--module", default=None, choices=MODULE_NAMES,
                        help="train a single module (default: all)")
    parser.add_argument("--finetune", default=None,
                        help="finetune dataset key (dip / imuposer)")
    parser.add_argument("--init-from", default=None,
                        help="combined weights .npz to initialize from")
    parser.add_argument("--fast-dev-run", action="store_true")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--combine", action="store_true",
                        help="merge best checkpoints after training")
    parser.add_argument("--resume", action="store_true",
                        help="resume each module from its train_state.npz "
                             "in --checkpoint-dir (params + optimizer + epoch)")
    parser.add_argument("--metrics", default=None,
                        help="extra metric sinks, comma-separated: "
                             "jsonl:<path>, csv:<path>, tensorboard:<dir>, "
                             "wandb:<project> (JSONL in the checkpoint dir "
                             "is always written)")
    parser.add_argument("--bf16-residuals", action="store_true",
                        help="store BPTT residuals in bf16 (+14-27%% step "
                             "throughput on v5e-1, ~1e-2 relative gradient "
                             "noise — design.md §6.3)")
    parser.add_argument("--concurrent", action="store_true",
                        help="advance all modules on each batch in one jit "
                             "region (TrainingManager.train_all — measured "
                             "1.81x end-to-end vs the sequential recipe on "
                             "v5e-1; same checkpoint layout)")
    args = parser.parse_args(argv)
    if args.concurrent and args.module:
        parser.error("--concurrent trains all modules; drop --module")

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    dataset = PoseDataset(fold="train", finetune=args.finetune,
                          body_model=body)
    if len(dataset) == 0:
        raise SystemExit("no training data found under "
                         f"{C.paths.processed_datasets} — run "
                         "`python -m mobileposer_tpu.cli.process` first")

    ckpt_path = Path(args.checkpoint_dir) if args.checkpoint_dir \
        else get_checkpoint_path()
    mgr = TrainingManager(finetune=args.finetune,
                          fast_dev_run=args.fast_dev_run,
                          backend=("auto_train_bf16res" if args.bf16_residuals
                                   else "auto_train"))

    init_params = None
    if args.init_from:
        from mobileposer_tpu.models.utils import load_model
        init_params = load_model(args.init_from)

    if args.concurrent:
        print("-" * 50)
        print(f"Training all modules concurrently: {MODULE_NAMES}")
        print("-" * 50)
        mgr.train_all(dataset, ckpt_path, body_model=body,
                      log_file=str(ckpt_path / "metrics.jsonl"),
                      metrics=args.metrics, resume=args.resume,
                      init_params=init_params)
        if args.combine:
            out = combine_weights(ckpt_path)
            print(f"Combined weights written to {out}")
        return

    modules = [args.module] if args.module else list(MODULE_NAMES)
    for name in modules:
        print("-" * 50)
        print(f"Training module: {name}")
        print("-" * 50)
        resume_from = None
        if args.resume:
            ts = ckpt_path / name / "train_state.npz"
            resume_from = ts if ts.exists() else None
        mgr.train_module(
            name, dataset, ckpt_path,
            init_params=init_params[name] if init_params else None,
            body_model=body if name == "poser" else None,
            log_file=str(ckpt_path / "metrics.jsonl"),
            metrics=args.metrics,
            resume_from=resume_from)

    if args.combine:
        out = combine_weights(ckpt_path)
        print(f"Combined weights written to {out}")


if __name__ == "__main__":
    main()
