"""On-chip smoke for the W8A8 int8 kernels (ops/lstm_pallas.py *_int8).

The int8 Pallas kernels are CI-tested in interpret mode (bit-exact vs the
XLA int8 scan, tests/test_quant.py), but interpret mode does not prove the
Mosaic TPU lowering of `jnp.dot(int8, int8, preferred_element_type=int32)`
or the in-kernel dynamic re-quantization. This script runs tiny shapes on
the real chip and pins kernel == XLA-int8-scan there too, then runs one
exact-mode window pass with quantized params end-to-end.

Run FIRST when validating int8 on a new chip/jax version:

    python scripts/int8_tpu_smoke.py

Exit code 0 = the int8 serving configs are safe to measure/deploy.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mobileposer_tpu.nn.lstm import (LSTMConfig, _lstm_scan, init_rnn,
                                         lstm_forward)
    from mobileposer_tpu.ops.lstm_pallas import (
        _project_timesteps, bilstm_layer_pallas_int8,
        lstm_layer_masked_pallas_int8, lstm_layer_pallas_int8)
    from mobileposer_tpu.ops.quant import quantize_params_int8

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)

    cfg = LSTMConfig(60, 72, 128)
    params = jax.device_get(init_rnn(jax.random.PRNGKey(1), cfg))
    pq = quantize_params_int8(params)
    rng = np.random.RandomState(2)
    hidden = jnp.asarray(rng.randn(8, 16, cfg.n_hidden).astype(np.float32))

    p0 = pq["lstm"][0]["fwd"]
    pb = pq["lstm"][0]["bwd"]
    xs = jnp.swapaxes(hidden, 0, 1)
    xp = jax.jit(lambda xs: _project_timesteps(xs, p0, xs.dtype))(xs)
    T, B = xp.shape[:2]
    H = p0["w_hh"].shape[0]
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    lengths = jnp.asarray([16, 5, 9, 16, 2, 11, 16, 7], jnp.int32)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(xs.dtype)

    # the XLA int8 scan is the reference (pure XLA, known-good lowering)
    ref_uni, _ = jax.jit(lambda: _lstm_scan(
        xp, p0["w_hh"], h0, c0, None, p0["w_hh_scale"]))()
    ref_msk, _ = jax.jit(lambda: _lstm_scan(
        xp, p0["w_hh"], h0, c0, mask, p0["w_hh_scale"]))()

    got_uni, _ = lstm_layer_pallas_int8(xp, p0["w_hh"], p0["w_hh_scale"],
                                        h0, c0)
    got_msk, _ = lstm_layer_masked_pallas_int8(
        xp, p0["w_hh"], p0["w_hh_scale"], h0, c0, mask)

    xpb = jax.jit(lambda xs: _project_timesteps(xs[::-1], pb, xs.dtype))(xs)
    ref_b, _ = jax.jit(lambda: _lstm_scan(
        xpb, pb["w_hh"], h0, c0, None, pb["w_hh_scale"]))()
    got_f, got_b, _, _ = bilstm_layer_pallas_int8(
        xp, xpb, p0["w_hh"], pb["w_hh"], p0["w_hh_scale"], pb["w_hh_scale"],
        h0, c0, h0, c0)

    checks = {
        "uni_kernel_vs_xla": float(jnp.abs(got_uni - ref_uni).max()),
        "masked_kernel_vs_xla": float(jnp.abs(got_msk - ref_msk).max()),
        "bi_fwd_vs_xla": float(jnp.abs(got_f - ref_uni).max()),
        "bi_bwd_vs_xla": float(jnp.abs(got_b - ref_b).max()),
    }
    # the int32 contraction is exact; only f32 dequant rounding may differ
    # between lowerings, so the bound is tight but not zero
    for name, err in checks.items():
        status = "ok" if err < 1e-4 else "FAIL"
        print(f"{name}: max |delta| = {err:.2e}  {status}", flush=True)

    # full multi-layer forward through lstm_forward's auto routing (on TPU
    # this exercises the int8 projections + the bi int8 kernel stack)
    y_auto, _ = jax.jit(
        lambda h: lstm_forward(pq["lstm"], h, backend="auto"))(hidden)
    y_xla, _ = jax.jit(
        lambda h: lstm_forward(pq["lstm"], h, backend="xla"))(hidden)
    e = float(jnp.abs(y_auto - y_xla).max())
    checks["forward_auto_vs_xla"] = e
    print(f"forward_auto_vs_xla: max |delta| = {e:.2e}  "
          f"{'ok' if e < 1e-4 else 'FAIL'}", flush=True)

    # one exact-mode streaming window pass with quantized params
    from mobileposer_tpu.kinematics import ParametricModel
    from mobileposer_tpu.models import MobilePoserNet, init_all_modules
    net = MobilePoserNet(ParametricModel.synthetic(num_vertices=48))
    full = quantize_params_int8(
        jax.device_get(init_all_modules(jax.random.PRNGKey(0))))
    st = jax.device_put(net.init_online_state_batched(4))
    frames = jnp.asarray(
        np.random.RandomState(3).randn(6, 4, 60).astype(np.float32) * 0.1)
    (pose, joints, root, contact), _ = jax.jit(
        net.forward_online_sequence_batched)(full, st, frames)
    finite = bool(np.isfinite(np.asarray(root)).all()
                  and np.isfinite(np.asarray(pose)).all())
    print("exact int8 streaming finite:", finite, flush=True)

    ok = finite and all(v < 1e-4 for v in checks.values())
    print("INT8 TPU SMOKE:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
