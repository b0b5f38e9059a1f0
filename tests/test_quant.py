"""W8A8 int8 quantized inference (ops/quant.py).

The int8 path is an opt-in serving configuration for BOTH streaming
modes: LSTM matmuls run int8 x int8 -> int32 on the MXU (2x the bf16
rate on v5e) — carry mode through the quantized cell step (pure XLA),
exact mode through int8 input projections + the int8 Pallas window
kernels (nn/lstm.py routing). Each quantized config must carry a
measured accuracy label — these tests bound the quantization error at
the cell/forward level on random weights and at the METRIC level on the
committed TRAINED checkpoint fixture for both modes, pin the kernels
against the XLA int8 scan (interpret mode) and their Mosaic TPU
lowering (jax.export), and pin the guard rails (training backends
reject quantized params; exact+int8 cannot shard over a mesh; bf16
casting must not destroy int8 kernels)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn.lstm import init_lstm_layer, lstm_cell_step
from mobileposer_tpu.ops.quant import (dynamic_quantize, int8_matmul,
                                       is_quantized,
                                       quantize_lstm_direction,
                                       quantize_params_int8,
                                       quantize_weight_int8)

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "demo_checkpoint_f16.npz")


def test_weight_quant_roundtrip():
    w = np.random.RandomState(0).randn(64, 128).astype(np.float32)
    q, s = quantize_weight_int8(w)
    assert q.dtype == np.int8 and s.dtype == np.float32
    # per-column symmetric: dequant error bounded by half a quantum
    err = np.abs(q.astype(np.float32) * s - w)
    assert (err <= 0.5 * s[None, :] + 1e-7).all()
    # negation symmetry (127-grid, no -128 corner)
    qn, sn = quantize_weight_int8(-w)
    np.testing.assert_array_equal(qn, -q)
    np.testing.assert_allclose(sn, s)


def test_dynamic_quantize_zero_row_safe():
    x = jnp.zeros((4, 16))
    q, s = jax.jit(dynamic_quantize)(x)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(q) == 0).all()


def test_int8_matmul_close_to_f32():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 64).astype(np.float32)
    w = rng.randn(64, 96).astype(np.float32)
    q, s = quantize_weight_int8(w)
    got = np.asarray(jax.jit(int8_matmul)(x, q, s))
    ref = x @ w
    # both operands are ~1% quantized; the contraction averages the noise
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.03, f"relative error {rel:.4f}"


def test_cell_dispatch_and_accuracy():
    """lstm_cell_step dispatches on int8 kernels and stays close to the
    f32 cell (~0.6% of the hidden range measured; bound 3x that)."""
    k = jax.random.PRNGKey(0)
    p = init_lstm_layer(k, 60, 256)
    pq = quantize_lstm_direction(jax.device_get(p))
    assert is_quantized(pq) and not is_quantized(jax.device_get(p))
    rng = np.random.RandomState(2)
    x = rng.randn(8, 60).astype(np.float32)
    h = np.tanh(rng.randn(8, 256)).astype(np.float32)
    c = rng.randn(8, 256).astype(np.float32)
    f = jax.jit(lstm_cell_step)
    h1, c1 = f(p, x, h, c)
    h2, c2 = f(pq, x, h, c)
    assert float(jnp.abs(h1 - h2).max()) < 0.02
    assert float(jnp.abs(c1 - c2).max()) < 0.03
    # bf16 carries keep their dtype through the quantized cell (scan
    # carries require a stable dtype)
    hb, cb = f(pq, x.astype(jnp.bfloat16), h.astype(jnp.bfloat16),
               c.astype(jnp.bfloat16))
    assert hb.dtype == jnp.bfloat16 and cb.dtype == jnp.bfloat16


def test_quantize_params_structure_and_cast_interplay():
    from mobileposer_tpu.models import init_all_modules
    from mobileposer_tpu.nn import cast_params
    params = jax.device_get(init_all_modules(jax.random.PRNGKey(0)))
    pq = quantize_params_int8(params)
    for mod in ("joints", "poser", "footcontact", "velocity"):
        # linears untouched
        np.testing.assert_array_equal(pq[mod]["linear1"]["w"],
                                      np.asarray(params[mod]["linear1"]["w"]))
        for layer in pq[mod]["lstm"]:
            for d in layer.values():
                assert d["w_ih"].dtype == np.int8
                assert d["w_hh"].dtype == np.int8
                assert d["w_ih_scale"].dtype == np.float32
                assert "b_ih" not in d and "b" in d
    # cast_params preserves quantization state: int8 kernels survive a
    # bf16 cast AND the f32 dequant scales do too (a bf16 scale would add
    # ~0.4% multiplicative dequant error on every matmul), while ordinary
    # float leaves (linears) cast as requested
    pq_bf = jax.device_get(cast_params(pq, jnp.bfloat16))
    d = pq_bf["joints"]["lstm"][0]["fwd"]
    assert np.asarray(d["w_ih"]).dtype == np.int8
    assert jnp.dtype(d["w_ih_scale"].dtype) == jnp.float32
    assert jnp.dtype(d["w_hh_scale"].dtype) == jnp.float32
    assert jnp.dtype(
        pq_bf["joints"]["linear1"]["w"].dtype) == jnp.bfloat16


def test_quantize_params_returns_device_resident_tree():
    """Regression pin for the r5 serving postmortem: quantize_params_int8
    once returned a NUMPY tree, and every jitted step call re-uploaded
    every leaf — over the tunneled pool chip that per-leaf transfer storm
    measured as a 10-20x serving 'slowdown' wrongly attributed to int8
    compute (scripts/int8_microbench.py caught it; ops/quant.py:119-126).
    Every leaf must come back as a committed jax.Array."""
    from mobileposer_tpu.models import init_all_modules
    params = jax.device_get(init_all_modules(jax.random.PRNGKey(0)))
    pq = quantize_params_int8(params)
    leaves = jax.tree_util.tree_leaves(pq)
    assert leaves, "quantized tree is empty"
    for leaf in leaves:
        assert isinstance(leaf, jax.Array), (
            f"non-device leaf {type(leaf)} would re-upload on every step")


def test_server_quantize_guards():
    """exact + int8 is a supported configuration — single-device (int8
    window kernels) AND sharded (the shard_map exact step runs the kernels
    per-device); unknown schemes fail loudly."""
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.parallel import make_mesh
    from mobileposer_tpu.stream.server import PoseServer
    net = MobilePoserNet(ParametricModel.synthetic(num_vertices=48))
    params = init_all_modules(jax.random.PRNGKey(0))
    s = PoseServer(net, params, port=0, mode="exact", quantize="int8")
    s.sock.close()
    assert s.quantize == "int8"
    with pytest.raises(ValueError, match="quantize"):
        PoseServer(net, params, port=0, mode="carry", quantize="fp4")
    mesh = make_mesh()
    if mesh.devices.size > 1:
        s2 = PoseServer(net, params, port=0, mode="exact", quantize="int8",
                        max_streams=mesh.devices.size, mesh=mesh)
        s2.sock.close()
        assert s2.quantize == "int8" and s2.mesh is mesh


def test_int8_exact_lstm_forward_close_to_f32():
    """The exact/windowed path accepts quantized params: int8 input
    projections + int8 recurrent scans stay within dynamic-quant noise of
    the float forward, full-length and masked."""
    from mobileposer_tpu.nn.lstm import LSTMConfig, init_rnn, rnn_apply
    cfg = LSTMConfig(60, 72, 128)
    params = jax.device_get(init_rnn(jax.random.PRNGKey(0), cfg))
    pq = quantize_params_int8(params)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 20, 60).astype(np.float32) * 0.5
    lengths = jnp.asarray([20, 13, 7, 20], jnp.int32)
    for kw in ({}, {"lengths": lengths}):
        yf, (hf, cf) = jax.jit(
            lambda p, x: rnn_apply(p, cfg, x, **kw))(params, x)
        yq, (hq, cq) = jax.jit(
            lambda p, x: rnn_apply(p, cfg, x, **kw))(pq, x)
        rel = float(jnp.abs(yq - yf).max() / jnp.abs(yf).max())
        assert rel < 0.03, f"kw={kw}: relative error {rel:.4f}"
        assert float(jnp.abs(hq - hf).max()) < 0.05

    # the serving configuration quantizes a bf16 cast (bf16 linears/
    # x_proj/carries + int8 kernels): dtypes stay bf16 end to end and
    # outputs stay within combined int8+bf16 noise of the f32 forward
    from mobileposer_tpu.nn import cast_params
    pq_bf = quantize_params_int8(jax.device_get(
        cast_params(params, jnp.bfloat16)))
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    yb, (hb, cb) = jax.jit(lambda p, x: rnn_apply(p, cfg, x))(pq_bf, xb)
    assert yb.dtype == jnp.bfloat16 and hb.dtype == jnp.bfloat16
    yf, _ = jax.jit(lambda p, x: rnn_apply(p, cfg, x))(params, x)
    rel = float(jnp.abs(yb.astype(jnp.float32) - yf).max()
                / jnp.abs(yf).max())
    assert rel < 0.06, f"bf16+int8 relative error {rel:.4f}"


def test_int8_pallas_kernels_match_xla_scan_interpret():
    """The int8 Pallas kernels (uni / masked / fused bi) agree with the
    int8 XLA scan bit-for-bit in interpret mode — the int8 x int8 -> int32
    contraction is exact, and both paths share int8_recurrent_gates."""
    from mobileposer_tpu.nn.lstm import (LSTMConfig, _lstm_scan, init_rnn,
                                         lstm_forward)
    from mobileposer_tpu.ops.lstm_pallas import (
        _project_timesteps, bilstm_layer_pallas_int8, lstm_forward_pallas,
        lstm_layer_masked_pallas_int8, lstm_layer_pallas_int8)
    cfg = LSTMConfig(60, 72, 128)
    params = jax.device_get(init_rnn(jax.random.PRNGKey(1), cfg))
    pq = quantize_params_int8(params)
    rng = np.random.RandomState(2)
    hidden = jnp.asarray(rng.randn(3, 12, cfg.n_hidden).astype(np.float32))

    # multi-layer bi full-length: kernel stack vs XLA int8 stack
    yk, (hk, ck) = lstm_forward_pallas(pq["lstm"], hidden, interpret=True)
    yx, (hx, cx) = lstm_forward(pq["lstm"], hidden, backend="xla")
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(hx), atol=1e-6)

    # single-layer masked + uni kernels vs the int8 scan
    p0 = pq["lstm"][0]["fwd"]
    xs = jnp.swapaxes(hidden, 0, 1)                      # [T, B, H]
    xp = _project_timesteps(xs, p0, xs.dtype)
    T, B = xp.shape[:2]
    H = p0["w_hh"].shape[0]
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    lengths = jnp.asarray([12, 5, 9], jnp.int32)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(xs.dtype)
    ysk, _ = lstm_layer_masked_pallas_int8(xp, p0["w_hh"], p0["w_hh_scale"],
                                           h0, c0, mask, interpret=True)
    yss, _ = _lstm_scan(xp, p0["w_hh"], h0, c0, mask,
                        w_hh_scale=p0["w_hh_scale"])
    np.testing.assert_allclose(np.asarray(ysk), np.asarray(yss), atol=1e-6)
    ysu, _ = lstm_layer_pallas_int8(xp, p0["w_hh"], p0["w_hh_scale"],
                                    h0, c0, interpret=True)
    ysn, _ = _lstm_scan(xp, p0["w_hh"], h0, c0, None,
                        w_hh_scale=p0["w_hh_scale"])
    np.testing.assert_allclose(np.asarray(ysu), np.asarray(ysn), atol=1e-6)

    # fused bi kernel vs per-direction int8 scans
    pf, pb = pq["lstm"][0]["fwd"], pq["lstm"][0]["bwd"]
    xpf = _project_timesteps(xs, pf, xs.dtype)
    xpb = _project_timesteps(xs[::-1], pb, xs.dtype)
    ysf, ysb, _, _ = bilstm_layer_pallas_int8(
        xpf, xpb, pf["w_hh"], pb["w_hh"], pf["w_hh_scale"],
        pb["w_hh_scale"], h0, c0, h0, c0, interpret=True)
    rf, _ = _lstm_scan(xpf, pf["w_hh"], h0, c0, None, pf["w_hh_scale"])
    rb, _ = _lstm_scan(xpb, pb["w_hh"], h0, c0, None, pb["w_hh_scale"])
    np.testing.assert_allclose(np.asarray(ysf), np.asarray(rf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ysb), np.asarray(rb), atol=1e-6)


def test_int8_kernels_lower_for_tpu():
    """jax.export runs the FULL Mosaic compilation pipeline for the TPU
    target on the CPU host — this pins, from CI, that the int8 kernels
    (int8 x int8 -> int32 jnp.dot, in-kernel dynamic re-quantization)
    keep lowering for TPU. Runtime equivalence on a real chip is
    scripts/int8_tpu_smoke.py's job."""
    from jax import export
    from mobileposer_tpu.nn.lstm import init_lstm_layer
    from mobileposer_tpu.ops.lstm_pallas import (bilstm_layer_pallas_int8,
                                                 lstm_layer_masked_pallas_int8,
                                                 lstm_layer_pallas_int8)
    pq = quantize_lstm_direction(
        jax.device_get(init_lstm_layer(jax.random.PRNGKey(0), 128, 128)))
    wq, ws = jnp.asarray(pq["w_hh"]), jnp.asarray(pq["w_hh_scale"])
    T, B, H = 5, 16, 128
    xp = jax.ShapeDtypeStruct((T, B, 4 * H), jnp.bfloat16)
    st = jax.ShapeDtypeStruct((B, H), jnp.bfloat16)
    mask = jax.ShapeDtypeStruct((T, B), jnp.bfloat16)
    for fn, args in [
        (lambda xp, h, c: lstm_layer_pallas_int8(xp, wq, ws, h, c),
         (xp, st, st)),
        (lambda xp, h, c, m: lstm_layer_masked_pallas_int8(
            xp, wq, ws, h, c, m), (xp, st, st, mask)),
        (lambda xf, xb, h, c: bilstm_layer_pallas_int8(
            xf, xb, wq, wq, ws, ws, h, c, h, c), (xp, xp, st, st)),
    ]:
        exported = export.export(jax.jit(fn), platforms=["tpu"])(*args)
        assert len(exported.serialize()) > 0


def test_int8_rejects_training_backends():
    from mobileposer_tpu.nn.lstm import LSTMConfig, init_rnn, lstm_forward
    cfg = LSTMConfig(60, 72, 64)
    pq = quantize_params_int8(
        jax.device_get(init_rnn(jax.random.PRNGKey(0), cfg)))
    x = jnp.zeros((2, 5, 64))
    with pytest.raises(ValueError, match="inference-only"):
        lstm_forward(pq["lstm"], x, backend="pallas_train")


def test_int8_carry_sharded_matches_single_device():
    """A data-parallel int8 serving fleet (stream axis sharded, quantized
    params replicated) produces the same outputs as one device — int8 is
    pure XLA (no pallas_call), so GSPMD shards it like the float path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    from mobileposer_tpu.parallel import (make_mesh, replicate_params,
                                          shard_stream_state)
    net = MobilePoserNet(ParametricModel.synthetic(num_vertices=48))
    params_q = quantize_params_int8(
        jax.device_get(init_all_modules(jax.random.PRNGKey(0))))
    mesh = make_mesh()
    S, N = 8, 3
    frames = np.random.RandomState(30).randn(N, S, 60).astype(np.float32) * 0.1
    run = jax.jit(net.forward_carry_sequence_batched)

    st0 = jax.tree_util.tree_map(jnp.asarray, net.init_carry_state_batched(S))
    (pose_ref, _, root_ref, _), _ = run(params_q, st0, frames)

    st_sh = shard_stream_state(net.init_carry_state_batched(S), S, mesh)
    frames_sh = jax.device_put(frames, NamedSharding(mesh, P(None, "data")))
    (pose_sh, _, root_sh, _), _ = run(replicate_params(params_q, mesh),
                                      st_sh, frames_sh)
    np.testing.assert_allclose(np.asarray(root_sh), np.asarray(root_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pose_sh), np.asarray(pose_ref),
                               atol=2e-5)


@pytest.fixture(scope="module")
def trained_params():
    if not os.path.exists(_FIXTURE):
        pytest.skip("trained checkpoint fixture not present")
    from mobileposer_tpu.train.trainer import load_combined_weights
    params = load_combined_weights(_FIXTURE)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params)


def test_int8_carry_metrics_close_on_trained_checkpoint(trained_params,
                                                        tmp_path):
    """The serving-grade bound: int8-carry vs f32-carry metric deltas on
    TRAINED weights must stay well inside the carry-vs-exact gap itself
    (SIP +0.52 deg) — quantization must not dominate the approximation
    it accelerates."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.evaluation import evaluate_pose
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet

    body = ParametricModel.synthetic(num_vertices=240)
    f = tmp_path / "eval.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=120, seed=21,
                                     body_model=body)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[f])
    view = EvalSequence(ds, combo="lw_rp")
    net = MobilePoserNet(body)
    res = {}
    for label, p in (("f32", trained_params),
                     ("int8", quantize_params_int8(trained_params))):
        out = evaluate_pose(net, p, view, online=True, verbose=False,
                            online_mode="carry", offline=False)
        res[label] = np.asarray(out["online"])
    delta = res["int8"] - res["f32"]
    # rows: 0 SIP(deg), 3 positional(cm), 6 jitter. Measured on this
    # fixture: +0.003 deg / -0.005 cm / +0.056 jitter — bounds leave two
    # orders of magnitude for eval-data variation while still catching a
    # broken quantizer (a mis-scaled gate moves SIP by tens of degrees).
    assert abs(delta[0, 0]) < 0.5, f"SIP int8 delta {delta[0, 0]:.3f} deg"
    assert abs(delta[3, 0]) < 0.5, f"pos int8 delta {delta[3, 0]:.3f} cm"
    assert abs(delta[6, 0]) < 0.2, f"jitter int8 delta {delta[6, 0]:.3f}"
    assert np.isfinite(res["int8"]).all()


def test_int8_exact_metrics_close_on_trained_checkpoint(trained_params,
                                                        tmp_path):
    """Same bound for the EXACT windowed path on int8 (nn/lstm.py int8
    projections + scans): quantization noise on trained weights must stay
    a fraction of the carry-vs-exact gap it is compared against."""
    from mobileposer_tpu.data import EvalSequence, PoseDataset
    from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
    from mobileposer_tpu.evaluation import evaluate_pose
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet

    body = ParametricModel.synthetic(num_vertices=240)
    f = tmp_path / "eval.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=120, seed=22,
                                     body_model=body)
    ds = PoseDataset(fold="test", evaluate="dip", body_model=body,
                     data_files=[f])
    view = EvalSequence(ds, combo="lw_rp")
    net = MobilePoserNet(body)
    res = {}
    for label, p in (("f32", trained_params),
                     ("int8", quantize_params_int8(trained_params))):
        out = evaluate_pose(net, p, view, online=True, verbose=False,
                            offline=False)
        res[label] = np.asarray(out["online"])
    delta = res["int8"] - res["f32"]
    assert abs(delta[0, 0]) < 0.5, f"SIP int8 delta {delta[0, 0]:.3f} deg"
    assert abs(delta[3, 0]) < 0.5, f"pos int8 delta {delta[3, 0]:.3f} cm"
    assert abs(delta[6, 0]) < 0.2, f"jitter int8 delta {delta[6, 0]:.3f}"
    assert np.isfinite(res["int8"]).all()
