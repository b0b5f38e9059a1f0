"""Reference-scale training recipe on real hardware.

The reference recipe is 60 epochs of base training plus a 2-stage
finetune chain — DIP then IMUPoser, 15 epochs each, joints+poser only
(`/root/reference/mobileposer/config.py:8-23`, `finetune.sh`). Earlier
rounds validated the trainer at 4-12 epochs; this script runs the FULL
recipe shape on synthetic data with the production configuration
(`--concurrent` fused multi-module step + bf16 stored residuals),
exercising at scale:

  * a mid-run crash/resume: the base phase is launched for
    `--resume-at` epochs, then a second TrainingManager resumes from the
    consistent train_state snapshots and completes to `--base-epochs`;
  * top-3 checkpoint rotation + metric sinks (JSONL) over 60 epochs;
  * the finetune chain warm-started from the base best checkpoints, the
    IMUPoser stage chained off finetuned_dip (cli/finetune.py semantics);
  * final evaluation of the combined finetuned weights (exact ONLINE
    protocol) on a held-out synthetic set.

Writes wall times, loss curves and final metrics to --report under
"recipe_scale" (benchmarks/report_v5e1.json).

    MP_ROOT=/tmp/recipe python scripts/recipe_scale.py \
        [--base-epochs 60] [--resume-at 30] [--finetune-epochs 15] \
        [--report benchmarks/report_v5e1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-epochs", type=int, default=60)
    parser.add_argument("--resume-at", type=int, default=30)
    parser.add_argument("--finetune-epochs", type=int, default=15)
    parser.add_argument("--base-seqs", type=int, default=24)
    parser.add_argument("--base-frames", type=int, default=1000)
    parser.add_argument("--report", default=None)
    args = parser.parse_args(argv)

    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import jax

    from mobileposer_tpu import config as C
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.evaluation import evaluate_pose
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet
    from mobileposer_tpu.nn.torch_convert import load_from_npz
    from mobileposer_tpu.train import (TrainingManager, combine_weights,
                                       get_best_checkpoint,
                                       load_combined_weights)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    root = C.paths.processed_datasets
    root.mkdir(parents=True, exist_ok=True)
    ckpt = C.paths.checkpoint / "recipe_scale"
    logs = ckpt / "logs"
    logs.mkdir(parents=True, exist_ok=True)

    def fixture(name, n, T, seed):
        f = root / name
        if not f.exists():
            make_synthetic_processed_dataset(f, n_sequences=n, T=T,
                                             seed=seed, body_model=body)
        return f

    print("building synthetic datasets...", flush=True)
    base_f = fixture("recipe_base.pt", args.base_seqs, args.base_frames, 31)
    dip_f = fixture("recipe_dip.pt", 8, 500, 41)
    imup_f = fixture("recipe_imuposer.pt", 8, 500, 43)
    test_f = fixture("recipe_test.pt", 4, 300, 53)

    ds_base = PoseDataset(fold="train", body_model=body, data_files=[base_f])
    result = {"config": {
        "base_epochs": args.base_epochs, "resume_at": args.resume_at,
        "finetune_epochs": args.finetune_epochs,
        "base_samples": len(ds_base),
        "batch_size": 256, "backend": "auto_train_bf16res",
        "concurrent": True,
    }}

    # -- phase 1a: base training up to the simulated crash -----------------
    t0 = time.time()
    mgr = TrainingManager(
        hypers=C.TrainHypers(batch_size=256, num_epochs=args.resume_at),
        backend="auto_train_bf16res")
    out1 = mgr.train_all(ds_base, ckpt, body_model=body,
                         metrics=f"jsonl:{logs}/base_metrics.jsonl")
    t1 = time.time()
    print(f"phase 1a ({args.resume_at} epochs): {t1 - t0:.1f}s", flush=True)

    # -- phase 1b: resume mid-recipe and complete to base_epochs -----------
    mgr = TrainingManager(
        hypers=C.TrainHypers(batch_size=256, num_epochs=args.base_epochs),
        backend="auto_train_bf16res")
    out2 = mgr.train_all(ds_base, ckpt, body_model=body, resume=True,
                         metrics=f"jsonl:{logs}/base_metrics.jsonl")
    t2 = time.time()
    print(f"phase 1b (resume -> {args.base_epochs}): {t2 - t1:.1f}s",
          flush=True)
    resumed_epochs = len(out2["history"]["poser"]["train_loss"])
    assert resumed_epochs == args.base_epochs - args.resume_at, (
        "resume retrained completed epochs", resumed_epochs)

    # top-3 rotation must hold after 60 epochs
    ckpt_counts = {m: len(list((ckpt / m).glob("epoch=*.npz")))
                   for m in ("joints", "poser", "footcontact", "velocity")}
    assert all(c <= 3 for c in ckpt_counts.values()), ckpt_counts

    base_combined = combine_weights(ckpt)

    # -- phase 2: finetune chain (joints+poser, dip then imuposer) ---------
    ft_times = {}
    prev_dir = ckpt
    for ds_name, f in (("dip", dip_f), ("imuposer", imup_f)):
        tA = time.time()
        init_params = {}
        for m in ("joints", "poser"):
            best = get_best_checkpoint(prev_dir / m)
            assert best is not None, (prev_dir, m)
            init_params[m] = load_from_npz(best)
        ds_ft = PoseDataset(fold="train", finetune=ds_name, body_model=body,
                            data_files=[f])
        out_dir = ckpt / f"finetuned_{ds_name}"
        mgr_ft = TrainingManager(
            finetune=ds_name,
            hypers=C.FinetuneHypers(batch_size=32,
                                    num_epochs=args.finetune_epochs,
                                    lr=5e-5),
            backend="auto_train_bf16res")
        out_ft = mgr_ft.train_all(
            ds_ft, out_dir, body_model=body,
            module_names=("joints", "poser"), init_params=init_params,
            metrics=f"jsonl:{logs}/ft_{ds_name}_metrics.jsonl")
        ft_times[ds_name] = round(time.time() - tA, 1)
        result[f"finetune_{ds_name}_val_loss"] = {
            m: [round(float(v), 5) for v in out_ft["history"][m]["val_loss"]]
            for m in ("joints", "poser")}
        prev_dir = out_dir
        print(f"finetune {ds_name}: {ft_times[ds_name]}s", flush=True)

    final_combined = combine_weights(ckpt, finetune="imuposer")

    # -- final metrics on held-out data ------------------------------------
    net = MobilePoserNet(body)
    params = load_combined_weights(final_combined)
    ds_test = PoseDataset(fold="test", evaluate="dip", body_model=body,
                          data_files=[test_f])
    res = evaluate_pose(net, params, EvalSequence(ds_test, combo="lw_rp"),
                        online=True, verbose=False)
    online = np.asarray(res["online"])
    t3 = time.time()

    hist = {m: out1["history"][m]["val_loss"]
            + out2["history"][m]["val_loss"]
            for m in out1["history"]}
    result.update({
        "wall_seconds": {
            "base_to_crash": round(t1 - t0, 1),
            "base_resume_to_60": round(t2 - t1, 1),
            "finetune": ft_times,
            "total": round(t3 - t0, 1),
        },
        "base_val_loss_first_last": {
            m: [round(float(v[0]), 5), round(float(v[-1]), 5)]
            for m, v in hist.items()},
        "base_val_loss_every5": {
            m: [round(float(x), 5) for x in v[::5]] for m, v in hist.items()},
        "checkpoints_kept_per_module": ckpt_counts,
        "resume_exercised": {"at_epoch": args.resume_at,
                             "epochs_after_resume": resumed_epochs},
        "final_eval_online": {
            "sip_deg": round(float(online[0, 0]), 3),
            "pos_cm": round(float(online[3, 0]), 3),
            "jitter": round(float(online[6, 0]), 4),
        },
        "all_losses_finite": bool(all(np.isfinite(v).all()
                                      for v in hist.values())),
    })
    print(json.dumps({k: result[k] for k in ("wall_seconds",
                                             "final_eval_online")}),
          flush=True)

    if args.report:
        from benchmarks.reporting import merge_report
        merge_report(args.report, result, key="recipe_scale")
        print(f"report updated: {args.report}", flush=True)
    return result


if __name__ == "__main__":
    main()
