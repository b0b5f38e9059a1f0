"""Carry-mode accuracy A/B on a trained checkpoint (real hardware).

Carry-mode streaming (models/streaming.py) is the max-throughput serving
configuration (2.0-2.9M frames/s) and is a documented approximation of the
reference's windowed ONLINE protocol. This script puts an accuracy label on
that claim: it trains (or reuses) the convergence-demo checkpoint, runs the
batched ONLINE protocol twice — `online_mode='exact'` vs `'carry'`
(evaluation/pose_eval.py:147-153; protocol per reference evaluate.py:62-64)
— on held-out synthetic sequences, and prints the two 8-row tables plus
their deltas as JSON.

    MP_ROOT=/tmp/carry_ab python scripts/carry_ab.py [--epochs 12] \
        [--save-fixture tests/fixtures/demo_checkpoint_f16.npz]

`--save-fixture` writes the combined trained weights as float16 npz so the
regression test (tests/test_carry_accuracy.py) can bound the exact-vs-carry
gap on a genuinely trained — not random — checkpoint without retraining.
Results land in benchmarks/report_v5e1.json under "carry_accuracy_ab" via
--report; docs/design.md records the headline deltas.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_fixture():
    """(body, fixture path) for the synthetic demo dataset — ONE place owns
    the n_sequences/T shape so --checkpoint runs evaluate on the same data
    the train-from-scratch path produced."""
    from mobileposer_tpu import config as C
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.kinematics import ParametricModel
    body = ParametricModel.from_file_or_synthetic(C.paths.smpl_file)
    fixture = C.paths.processed_datasets / "synthetic.pt"
    if not fixture.exists():
        fixture.parent.mkdir(parents=True, exist_ok=True)
        make_synthetic_processed_dataset(fixture, n_sequences=8, T=400)
    return body, fixture


def train_demo_checkpoint(epochs: int, batch_size: int = 64):
    """Train all four modules on the synthetic fixture; return combined path
    (same recipe as scripts/convergence_demo.py)."""
    from mobileposer_tpu import config as C
    from mobileposer_tpu.data import PoseDataset
    from mobileposer_tpu.train.trainer import TrainingManager, combine_weights

    body, fixture = ensure_fixture()
    ds = PoseDataset(fold="train", body_model=body, data_files=[fixture])
    mgr = TrainingManager(hypers=C.TrainHypers(batch_size=batch_size,
                                               num_epochs=epochs))
    ckpt = str(C.paths.checkpoint / "carry_ab")
    for m in ("joints", "poser", "footcontact", "velocity"):
        out = mgr.train_module(m, ds, ckpt, body_model=body)
        h = out["history"]
        print(f"{m}: val {h['val_loss'][0]:.4f} -> {h['val_loss'][-1]:.4f}",
              flush=True)
    return combine_weights(ckpt), body, fixture


def run_ab(params, body, fixture, rows=(0, 3, 6), int8=False):
    """ONLINE protocol exact vs carry on the held-out synthetic view.
    Returns dict with both 8-row tables and the per-row deltas. With
    int8=True, two more legs run carry AND exact mode on W8A8-quantized
    params (ops/quant.py) so both int8 serving configs get the same
    measured accuracy label carry mode itself carries."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.evaluation import evaluate_pose
    from mobileposer_tpu.evaluation.pose_eval import METRIC_NAMES
    from mobileposer_tpu.models import MobilePoserNet

    test = PoseDataset(fold="test", evaluate="dip", body_model=body,
                       data_files=[fixture])
    view = EvalSequence(test, combo="lw_rp")
    net = MobilePoserNet(body)
    legs = {"exact": ("exact", params), "carry": ("carry", params)}
    if int8:
        from mobileposer_tpu.ops.quant import quantize_params_int8
        pq = quantize_params_int8(params)
        legs["carry_int8"] = ("carry", pq)
        legs["exact_int8"] = ("exact", pq)
    out = {}
    for leg, (mode, p) in legs.items():
        # the quantized legs label the ONLINE serving configs; skip their
        # offline windowed pass (it answers no serving question)
        res = evaluate_pose(net, p, view, online=True, verbose=False,
                            online_mode=mode,
                            offline=not leg.endswith("_int8"))
        out[leg] = np.asarray(res["online"])
    delta = out["carry"] - out["exact"]
    report = {
        "protocol": "batched ONLINE (evaluate.py:62-64), synthetic held-out "
                    "view, trained convergence-demo checkpoint",
        "metric_names": list(METRIC_NAMES),
        "exact_mean": out["exact"][:, 0].round(4).tolist(),
        "carry_mean": out["carry"][:, 0].round(4).tolist(),
        "delta_mean": delta[:, 0].round(4).tolist(),
        "headline": {METRIC_NAMES[i]: {
            "exact": float(out["exact"][i, 0]),
            "carry": float(out["carry"][i, 0]),
            "delta": float(delta[i, 0])} for i in rows},
    }
    if int8:
        d8 = out["carry_int8"] - out["carry"]
        dx8 = out["exact_int8"] - out["exact"]
        report["carry_int8_mean"] = out["carry_int8"][:, 0].round(4).tolist()
        report["int8_delta_vs_carry_mean"] = d8[:, 0].round(4).tolist()
        report["exact_int8_mean"] = out["exact_int8"][:, 0].round(4).tolist()
        report["int8_delta_vs_exact_mean"] = dx8[:, 0].round(4).tolist()
        report["headline_int8"] = {METRIC_NAMES[i]: {
            "carry": float(out["carry"][i, 0]),
            "carry_int8": float(out["carry_int8"][i, 0]),
            "delta_vs_carry": float(d8[i, 0]),
            "exact": float(out["exact"][i, 0]),
            "exact_int8": float(out["exact_int8"][i, 0]),
            "delta_vs_exact": float(dx8[i, 0])} for i in rows}
    return report


def save_fixture(params, path):
    """Combined weights as float16 npz (halves the footprint; the loader
    casts back to float32)."""
    import jax
    from mobileposer_tpu.nn.torch_convert import export_to_npz
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x).astype(np.float16), params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    export_to_npz(f16, path)
    print(f"fixture saved: {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="existing combined .npz (skips training)")
    parser.add_argument("--save-fixture", type=str, default=None)
    parser.add_argument("--report", type=str, default=None,
                        help="merge results into this json under "
                             "'carry_accuracy_ab'")
    parser.add_argument("--int8", action="store_true",
                        help="also measure carry mode on W8A8-quantized "
                             "params (third A/B leg)")
    args = parser.parse_args(argv)

    from mobileposer_tpu.train.trainer import load_combined_weights

    if args.checkpoint:
        import jax
        body, fixture = ensure_fixture()
        params = load_combined_weights(args.checkpoint)
        # the committed fixture is stored f16 (footprint); compute in f32
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32)
            if np.asarray(x).dtype == np.float16 else x, params)
        combined = args.checkpoint
    else:
        combined, body, fixture = train_demo_checkpoint(args.epochs)
        params = load_combined_weights(combined)

    if args.save_fixture:
        save_fixture(params, args.save_fixture)

    report = run_ab(params, body, fixture, int8=args.int8)
    print(json.dumps(report), flush=True)

    if args.report:
        from benchmarks.reporting import merge_report
        merge_report(args.report, report, key="carry_accuracy_ab")
        print(f"report updated: {args.report}", flush=True)


if __name__ == "__main__":
    main()
