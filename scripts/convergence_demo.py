"""End-to-end learning check on real hardware, no external data.

Synthesizes a fixture dataset, trains all four modules for a few epochs,
combines the best checkpoints, and evaluates the result against an
untrained model — the whole process -> train -> combine -> evaluate
pipeline exercised with metrics that must improve by an order of
magnitude if the framework's losses/optimizers/evaluation agree.

    MP_ROOT=/tmp/demo python scripts/convergence_demo.py [--epochs 12] \
        [--concurrent]

Measured on TPU v5e-1 (12 epochs, ~7 min wall incl. compiles):
untrained SIP 133.0 deg / 55.5 cm positional -> trained SIP 21.3 deg /
11.0 cm. --concurrent trains all modules per batch in one jit region
(1.8x the training wall, design.md §6.3) and converges to the same
metrics (verified r3: SIP 21.68 deg both recipes). Synthetic in-domain
data — a pipeline-health check, NOT a real-dataset accuracy claim
(that is parity day, docs/parity.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--concurrent", action="store_true",
                        help="train all modules per batch in one jit region "
                             "(TrainingManager.train_all, 1.49x end-to-end)")
    args = parser.parse_args(argv)

    import jax

    from mobileposer_tpu import config as C
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.evaluation import evaluate_pose
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.train.trainer import (TrainingManager,
                                               combine_weights,
                                               load_combined_weights)

    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    fixture = C.paths.processed_datasets / "synthetic.pt"
    if not fixture.exists():
        fixture.parent.mkdir(parents=True, exist_ok=True)
        make_synthetic_processed_dataset(fixture, n_sequences=8, T=400)
        print(f"synthesized fixture: {fixture}", flush=True)

    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture])
    print("windows:", len(ds), flush=True)
    mgr = TrainingManager(hypers=C.TrainHypers(batch_size=args.batch_size,
                                               num_epochs=args.epochs))
    # fresh checkpoint dir: stale top-k entries from a previous run would
    # win combine_weights and falsify "this run's" trained metrics
    import shutil
    ckpt = str(C.paths.checkpoint / "convergence_demo")
    shutil.rmtree(ckpt, ignore_errors=True)
    if args.concurrent:
        out_all = mgr.train_all(ds, ckpt, body_model=body)
        for m, h in out_all["history"].items():
            print(f"{m}: train {h['train_loss'][0]:.4f} -> "
                  f"{h['train_loss'][-1]:.4f}  val {h['val_loss'][0]:.4f} -> "
                  f"{h['val_loss'][-1]:.4f}", flush=True)
    else:
        for m in ("joints", "poser", "footcontact", "velocity"):
            out = mgr.train_module(m, ds, ckpt, body_model=body)
            h = out["history"]
            print(f"{m}: train {h['train_loss'][0]:.4f} -> "
                  f"{h['train_loss'][-1]:.4f}  val {h['val_loss'][0]:.4f} -> "
                  f"{h['val_loss'][-1]:.4f}", flush=True)
    path = combine_weights(ckpt)
    print("combined:", path, flush=True)

    test = PoseDataset(fold="test", evaluate="dip", body_model=body,
                       data_files=[fixture])
    view = EvalSequence(test, combo="lw_rp")
    net = MobilePoserNet(body)
    results = {}
    for label, params in (("untrained",
                           init_all_modules(jax.random.PRNGKey(0))),
                          ("trained", load_combined_weights(path))):
        res = evaluate_pose(net, params, view, online=False, verbose=False)
        off = np.asarray(res["offline"])
        results[label] = off
        print(f"{label}: SIP {off[0, 0]:.2f} deg | positional "
              f"{off[3, 0]:.2f} cm | mesh {off[5, 0]:.2f} cm", flush=True)
    # a fresh model needs a few epochs to halve SIP; very short smoke runs
    # only need to beat the untrained baseline
    factor = 2.0 if args.epochs >= 4 else 1.0
    assert results["trained"][0, 0] * factor < results["untrained"][0, 0], (
        f"training did not improve SIP error enough "
        f"(needed {factor}x at {args.epochs} epochs)")
    print("convergence demo OK", flush=True)


if __name__ == "__main__":
    main()
