"""CI bound: carry-mode accuracy must not degrade with stream age.

Carry's forward state never resets (models/streaming.py:10-14), so its
divergence from the exact windowed semantics could in principle grow as a
stream ages — and serving keeps streams alive for 10^5+ frames. The full
horizon (10^5 frames, both modes, trained checkpoint) is characterized on
real hardware by scripts/carry_drift.py (recorded in
benchmarks/report_v5e1.json "carry_drift_horizon"); this test bounds a
shorter horizon on CPU so a regression that makes carry error GROW with
age fails CI.

The bound compares the carry-vs-exact SIP gap per window of stream age:
late windows must not exceed early windows by more than a noise margin.
Exact mode normalizes out per-window motion difficulty (its window state
is intrinsically age-independent), so the bound isolates age effects.
"""

import os

import numpy as np
import pytest

import jax

from mobileposer_tpu.evaluation.drift import (
    make_stream_motion, synthesize_stream_frames, windowed_stream_metrics)
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import MobilePoserNet
from mobileposer_tpu.train.trainer import load_combined_weights

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "demo_checkpoint_f16.npz")

_N_FRAMES = 6144
_WINDOW = 512
_STREAMS = 2


@pytest.fixture(scope="module")
def curves():
    if not os.path.exists(_FIXTURE):
        pytest.skip("trained checkpoint fixture not present")
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), load_combined_weights(_FIXTURE))
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body)
    rng = np.random.default_rng(23)
    aa, tran = make_stream_motion(rng, _N_FRAMES, _STREAMS)
    frames = synthesize_stream_frames(body, aa, tran, chunk=2048)
    out = {}
    for mode in ("exact", "carry"):
        out[mode] = windowed_stream_metrics(net, params, frames, aa,
                                            mode, _WINDOW, tran_gt=tran)
    return out


def test_window_chained_streaming_matches_single_pass():
    """The drift stepper's core invariant: streaming a sequence in window
    calls with the state carried across calls must equal one whole-sequence
    call, for BOTH modes (a chaining bug would masquerade as age drift)."""
    import jax.numpy as jnp

    from mobileposer_tpu.models import MobilePoserNet, init_all_modules

    body = ParametricModel.synthetic(num_vertices=48)
    net = MobilePoserNet(body)
    params = init_all_modules(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(0, 0.1, (64, 2, 60)).astype(np.float32))
    for mode, init, fwd in (
            ("exact", net.init_online_state_batched,
             net.forward_online_sequence_batched),
            ("carry", net.init_carry_state_batched,
             net.forward_carry_sequence_batched)):
        (pose_full, _, root_full, _), _ = jax.jit(fwd)(
            params, jax.device_put(init(2)), frames)
        st = jax.device_put(init(2))
        poses, roots = [], []
        for w in range(0, 64, 16):
            (p, _, r, _), st = jax.jit(fwd)(params, st, frames[w:w + 16])
            poses.append(np.asarray(p))
            roots.append(np.asarray(r))
        np.testing.assert_allclose(np.concatenate(poses),
                                   np.asarray(pose_full), atol=2e-5,
                                   err_msg=mode)
        np.testing.assert_allclose(np.concatenate(roots),
                                   np.asarray(root_full), atol=2e-5,
                                   err_msg=mode)


def test_chunked_synthesis_matches_single_shot():
    """synthesize_stream_frames must be chunk-size invariant: the 8-frame
    overlap feeds the accelerometer stencil continuous context, so chunked
    output equals one whole-sequence synthesis everywhere (the reference's
    zero-acc boundary frames appear only at the true stream edges)."""
    body = ParametricModel.synthetic(num_vertices=48)
    rng = np.random.default_rng(5)
    aa, tran = make_stream_motion(rng, 300, 1)
    small = synthesize_stream_frames(body, aa, tran, chunk=128)
    big = synthesize_stream_frames(body, aa, tran, chunk=512)
    np.testing.assert_allclose(np.asarray(small), np.asarray(big),
                               atol=1e-5, rtol=1e-5)


def test_carry_gap_does_not_grow_with_stream_age(curves):
    gap = (curves["carry"]["sip_deg"] - curves["exact"]["sip_deg"]
           ).mean(axis=1)                              # [n_windows]
    n = gap.shape[0]
    assert n == _N_FRAMES // _WINDOW
    early = gap[:n // 3].mean()
    late = gap[-n // 3:].mean()
    # measured on the trained fixture (carry_drift_horizon): the gap is
    # flat with age (drift |<0.1| deg over 10^5 frames); 1.0 deg margin
    # absorbs window-level noise while catching a real divergence, which
    # compounds to tens of degrees
    assert late <= early + 1.0, (
        f"carry SIP gap grew with stream age: early {early:.3f} deg -> "
        f"late {late:.3f} deg")


def test_tran_drift_gap_does_not_grow_with_stream_age(curves):
    """Translation is the one output a long-lived stream ACCUMULATES (the
    fusion anchors never reset), so the 1-7 m drift-window metric
    (reference evaluate.py:66-92) is the most plausibly age-sensitive —
    bound its carry-vs-exact gap late vs early like the SIP bound."""
    for mode in ("exact", "carry"):
        d = curves[mode]["tran_drift_m"]
        assert d.shape == curves[mode]["sip_deg"].shape
        # at least most windows must have produced 1-7 m travel windows
        assert np.isfinite(d).mean() > 0.5, mode
    gap = (np.nanmean(curves["carry"]["tran_drift_m"], axis=1)
           - np.nanmean(curves["exact"]["tran_drift_m"], axis=1))
    n = gap.shape[0]
    early = np.nanmean(gap[:n // 3])
    late = np.nanmean(gap[-n // 3:])
    # normalized drift is m-per-window-meter (O(0.1) on the trained
    # fixture); 0.5 margin absorbs window noise, catches real divergence
    assert late <= early + 0.5, (
        f"carry tran drift gap grew with stream age: early {early:.3f} -> "
        f"late {late:.3f} m/m")


def test_carry_metrics_stay_finite_and_bounded(curves):
    """No window at any age may blow up (NaN/inf or catastrophic error) in
    either mode — a non-resetting state that diverges would show here."""
    for mode in ("exact", "carry"):
        for key in ("sip_deg", "pos_cm"):
            v = curves[mode][key]
            assert np.isfinite(v).all(), (mode, key)
    # absolute sanity on the trained checkpoint: far from the ~133 deg
    # untrained level at EVERY age
    assert curves["carry"]["sip_deg"].max() < 90.0
