"""Carry-mode accuracy vs STREAM AGE at serving horizons (real hardware).

The carry-accuracy A/B (scripts/carry_ab.py) labels the approximation on
T~10^2 eval sequences; serving keeps streams alive for 10^5-10^6 frames
and carry's forward state never resets (models/streaming.py:10-14). This
script streams S independent long synthetic motions through BOTH modes
with the trained fixture checkpoint, computing windowed SIP/positional
error per 1024-frame window as the stream ages (evaluation/drift.py), and
records the drift curve:

    python scripts/carry_drift.py [--frames 102400] [--streams 8]
        [--window 1024] [--report benchmarks/report_v5e1.json]

Output JSON: per-window exact/carry means across streams + a drift
summary (late-minus-early delta of the carry-vs-exact gap). Merged into
--report under "carry_drift_horizon"; the CI bound at a shorter horizon
lives in tests/test_carry_drift.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=102400)
    parser.add_argument("--streams", type=int, default=8)
    parser.add_argument("--window", type=int, default=1024)
    parser.add_argument("--checkpoint", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "demo_checkpoint_f16.npz"))
    parser.add_argument("--report", default=None)
    args = parser.parse_args(argv)

    from mobileposer_tpu.utils.helpers import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    import jax
    import jax.numpy as jnp

    from mobileposer_tpu.evaluation.drift import (
        make_stream_motion, synthesize_stream_frames, windowed_stream_metrics)
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet
    from mobileposer_tpu.train.trainer import load_combined_weights

    body = ParametricModel.from_file_or_synthetic(None)
    net = MobilePoserNet(body)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32),
        load_combined_weights(args.checkpoint))

    rng = np.random.default_rng(17)
    N, S, W = args.frames, args.streams, args.window
    print(f"generating {N} x {S} frames of synthetic motion...", flush=True)
    aa, tran = make_stream_motion(rng, N, S)
    t0 = time.time()
    frames = synthesize_stream_frames(body, aa, tran)
    jax.block_until_ready(frames)
    print(f"synthesis: {time.time() - t0:.1f}s", flush=True)

    curves = {}
    for mode in ("exact", "carry"):
        t0 = time.time()
        curves[mode] = windowed_stream_metrics(net, params, frames, aa,
                                               mode, W, tran_gt=tran)
        print(f"{mode}: {N * S} frames in {time.time() - t0:.1f}s", flush=True)

    n_win = curves["exact"]["sip_deg"].shape[0]
    # mean across streams per window; gap = carry - exact
    sip_e = curves["exact"]["sip_deg"].mean(axis=1)
    sip_c = curves["carry"]["sip_deg"].mean(axis=1)
    pos_e = curves["exact"]["pos_cm"].mean(axis=1)
    pos_c = curves["carry"]["pos_cm"].mean(axis=1)
    gap_sip = sip_c - sip_e
    gap_pos = pos_c - pos_e
    # translation drift (reference evaluate.py:66-92 semantics) per
    # stream-age window: the fusion anchors never reset, so the root
    # trajectory is the one output a long-lived stream accumulates
    drift_e = np.nanmean(curves["exact"]["tran_drift_m"], axis=1)
    drift_c = np.nanmean(curves["carry"]["tran_drift_m"], axis=1)
    gap_drift = drift_c - drift_e

    q = max(n_win // 4, 1)                 # quarter of the horizon
    early_sip, late_sip = gap_sip[:q].mean(), gap_sip[-q:].mean()
    early_pos, late_pos = gap_pos[:q].mean(), gap_pos[-q:].mean()
    early_dr = float(np.nanmean(gap_drift[:q]))
    late_dr = float(np.nanmean(gap_drift[-q:]))

    # per-stream late-minus-early spread: drift must hold per stream, not
    # just on the mean
    per_stream_drift = (
        (curves["carry"]["sip_deg"][-q:] - curves["exact"]["sip_deg"][-q:])
        .mean(axis=0)
        - (curves["carry"]["sip_deg"][:q] - curves["exact"]["sip_deg"][:q])
        .mean(axis=0))

    result = {
        "frames": N, "streams": S, "window": W,
        "checkpoint": os.path.basename(args.checkpoint),
        "window_frame_centers": [int((i + 0.5) * W) for i in range(n_win)],
        "exact_sip_deg": np.round(sip_e, 4).tolist(),
        "carry_sip_deg": np.round(sip_c, 4).tolist(),
        "exact_pos_cm": np.round(pos_e, 4).tolist(),
        "carry_pos_cm": np.round(pos_c, 4).tolist(),
        "exact_tran_drift_m_per_window_m": np.round(drift_e, 4).tolist(),
        "carry_tran_drift_m_per_window_m": np.round(drift_c, 4).tolist(),
        "tran_drift_per_w_exact": {
            str(w): np.round(v, 4).tolist()
            for w, v in curves["exact"]["tran_drift_per_w"].items()},
        "tran_drift_per_w_carry": {
            str(w): np.round(v, 4).tolist()
            for w, v in curves["carry"]["tran_drift_per_w"].items()},
        "gap_summary": {
            "sip_gap_first_quarter_deg": round(float(early_sip), 4),
            "sip_gap_last_quarter_deg": round(float(late_sip), 4),
            "sip_drift_deg": round(float(late_sip - early_sip), 4),
            "pos_gap_first_quarter_cm": round(float(early_pos), 4),
            "pos_gap_last_quarter_cm": round(float(late_pos), 4),
            "pos_drift_cm": round(float(late_pos - early_pos), 4),
            "sip_drift_per_stream_max_deg": round(
                float(per_stream_drift.max()), 4),
            "tran_drift_gap_first_quarter_m": round(early_dr, 4),
            "tran_drift_gap_last_quarter_m": round(late_dr, 4),
            "tran_drift_drift_m": round(late_dr - early_dr, 4),
        },
    }
    print(json.dumps(result["gap_summary"]), flush=True)

    if args.report:
        from benchmarks.reporting import merge_report
        merge_report(args.report, result, key="carry_drift_horizon")
        print(f"report updated: {args.report}", flush=True)
    return result


if __name__ == "__main__":
    main()
