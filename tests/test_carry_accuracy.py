"""Carry-mode accuracy regression bound on a TRAINED checkpoint.

Carry-mode streaming is the advertised max-throughput serving config and a
documented approximation (models/streaming.py). Measured on TPU v5e-1 with
the trained convergence-demo checkpoint (scripts/carry_ab.py; recorded in
benchmarks/report_v5e1.json "carry_accuracy_ab"): the ONLINE-protocol
exact-vs-carry deltas are SIP +0.52 deg, positional +0.34 cm, jitter
-0.064 (carry is SMOOTHER — the carried forward state never resets).

This test reruns the A/B on the committed f16 fixture of those trained
weights (tests/fixtures/demo_checkpoint_f16.npz, written by carry_ab.py
--save-fixture) over fresh synthetic sequences and bounds the gap, so a
change to carry mode that degrades accuracy on real weights — not just on
random ones — fails CI.
"""

import os

import numpy as np
import pytest

import jax

from mobileposer_tpu.data import EvalSequence, PoseDataset
from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
from mobileposer_tpu.evaluation import evaluate_pose
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.train.trainer import load_combined_weights

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "demo_checkpoint_f16.npz")


@pytest.fixture(scope="module")
def trained_params():
    if not os.path.exists(_FIXTURE):
        pytest.skip("trained checkpoint fixture not present")
    params = load_combined_weights(_FIXTURE)
    # fixture is stored f16 to halve the repo footprint; compute in f32
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params)


def test_carry_vs_exact_bounded_on_trained_checkpoint(trained_params,
                                                      tmp_path):
    body = ParametricModel.synthetic(num_vertices=240)
    f = tmp_path / "eval.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=120, seed=9,
                                     body_model=body)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[f])
    view = EvalSequence(ds, combo="lw_rp")
    net = MobilePoserNet(body)
    res = {}
    for mode in ("exact", "carry"):
        out = evaluate_pose(net, trained_params, view, online=True,
                            verbose=False, online_mode=mode)
        res[mode] = np.asarray(out["online"])
    delta = res["carry"] - res["exact"]
    # rows: 0 SIP(deg), 3 positional(cm), 6 jitter(100m/s^3)
    # measured deltas on-chip: +0.52 deg / +0.34 cm / -0.064; bounds leave
    # room for eval-data variation but catch a broken approximation (the
    # deltas of an untrained/randomly-perturbed carry path are tens of
    # degrees)
    assert abs(delta[0, 0]) < 3.0, f"SIP delta {delta[0, 0]:.2f} deg"
    assert abs(delta[3, 0]) < 2.0, f"positional delta {delta[3, 0]:.2f} cm"
    assert np.isfinite(res["carry"]).all()
    # and the trained checkpoint must actually be trained: far better than
    # the untrained ~133 deg SIP baseline on in-domain data
    assert res["exact"][0, 0] < 60.0, "fixture does not look trained"


def test_bf16_eval_close_to_f32_on_trained_checkpoint(trained_params,
                                                      tmp_path):
    """evaluate_pose(bf16=True): the +16%-throughput inference dtype must
    stay metrically close to f32 on trained weights (design.md §6.2 bound
    analysis; parity-day runs keep f32)."""
    body = ParametricModel.synthetic(num_vertices=240)
    f = tmp_path / "eval.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=100, seed=13,
                                     body_model=body)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[f])
    view = EvalSequence(ds, combo="lw_rp")
    net = MobilePoserNet(body)
    res = {}
    for label, flag in (("f32", False), ("bf16", True)):
        out = evaluate_pose(net, trained_params, view, online=False,
                            verbose=False, bf16=flag)
        res[label] = np.asarray(out["offline"])
    delta = res["bf16"] - res["f32"]
    assert abs(delta[0, 0]) < 2.0, f"SIP bf16 delta {delta[0, 0]:.2f} deg"
    assert abs(delta[3, 0]) < 1.5, f"pos bf16 delta {delta[3, 0]:.2f} cm"
    assert np.isfinite(res["bf16"]).all()
