"""Pallas LSTM kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn import LSTMConfig, init_rnn, rnn_apply, rnn_zero_state
from mobileposer_tpu.ops import lstm_layer_pallas, rnn_apply_pallas


def test_lstm_layer_matches_scan():
    from mobileposer_tpu.nn.lstm import _lstm_scan, init_lstm_layer
    H, B, T = 16, 4, 9
    p = init_lstm_layer(jax.random.PRNGKey(0), H, H)
    x_proj = jax.random.normal(jax.random.PRNGKey(1), (T, B, 4 * H))
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    ys_ref, (h_ref, c_ref) = _lstm_scan(x_proj, p["w_hh"], h0, c0, None)
    ys, (h_t, c_t) = lstm_layer_pallas(x_proj, p["w_hh"], h0, c0,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_ref), atol=1e-5)


@pytest.mark.parametrize("bidirectional", [True, False])
def test_rnn_apply_pallas_matches_xla(bidirectional):
    cfg = LSTMConfig(12, 7, 16, bidirectional=bidirectional)
    params = init_rnn(jax.random.PRNGKey(2), cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 11, 12))
    y_xla, hc_xla = rnn_apply(params, cfg, x)
    y_pl, hc_pl = rnn_apply_pallas(params, cfg, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hc_pl[0]), np.asarray(hc_xla[0]),
                               atol=1e-5)


def test_rnn_apply_pallas_carried_state():
    cfg = LSTMConfig(12, 7, 16, bidirectional=False)
    params = init_rnn(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 20, 12))
    y_full, _ = rnn_apply(params, cfg, x)
    hc = rnn_zero_state(cfg, 1)
    chunks = []
    for t0 in range(0, 20, 5):
        y, hc = rnn_apply_pallas(params, cfg, x[:, t0:t0 + 5], h0c0=hc,
                                 interpret=True)
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(chunks, 1), np.asarray(y_full),
                               atol=1e-5)


def test_masked_layer_matches_scan():
    """Masked inference kernel == the masked XLA scan: outputs zeroed past
    each length, carry held, final state at the last valid frame."""
    from mobileposer_tpu.nn.lstm import _lstm_scan, init_lstm_layer
    from mobileposer_tpu.ops.lstm_pallas import lstm_layer_masked_pallas
    T, B, D, H = 13, 4, 8, 8
    p = init_lstm_layer(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, D))
    x_proj = x @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, H)) * 0.3
    c0 = jax.random.normal(jax.random.PRNGKey(3), (B, H)) * 0.3
    lengths = jnp.asarray([13, 5, 1, 9])
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(x.dtype)

    ys_x, (h_x, c_x) = _lstm_scan(x_proj, p["w_hh"], h0, c0, mask)
    ys_p, (h_p, c_p) = lstm_layer_masked_pallas(x_proj, p["w_hh"], h0, c0,
                                                mask, interpret=True)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=1e-6)


def test_masked_diffable_grads_match_xla():
    """The custom-VJP wrapper around the masked kernel (nn/lstm.py
    _masked_pallas_diffable) must produce the XLA scan's gradients —
    backend='auto' with lengths is differentiable on TPU (advisor r2)."""
    from mobileposer_tpu.nn.lstm import (_lstm_scan, _masked_pallas_diffable,
                                         init_lstm_layer)
    H, B, T = 16, 4, 9
    p = init_lstm_layer(jax.random.PRNGKey(0), H, H)
    x_proj = jax.random.normal(jax.random.PRNGKey(1), (T, B, 4 * H))
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    lengths = jnp.asarray([9, 4, 7, 1], jnp.int32)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(x_proj.dtype)

    def loss_kernel(xp, w):
        ys, (h_t, c_t) = _masked_pallas_diffable(True, xp, w, h0, c0, mask)
        return (ys ** 2).sum() + (h_t * c_t).sum()

    def loss_xla(xp, w):
        ys, (h_t, c_t) = _lstm_scan(xp, w, h0, c0, mask)
        return (ys ** 2).sum() + (h_t * c_t).sum()

    v_k, g_k = jax.value_and_grad(loss_kernel, argnums=(0, 1))(
        x_proj, p["w_hh"])
    v_x, g_x = jax.value_and_grad(loss_xla, argnums=(0, 1))(
        x_proj, p["w_hh"])
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=1e-5)
    for a, b in zip(g_k, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_forced_pallas_backend_off_tpu_raises():
    """Forcing a pallas backend on a non-TPU platform must fail with a
    descriptive error, not an opaque Mosaic lowering failure (advisor r2)."""
    cfg = LSTMConfig(12, 7, 16)
    params = init_rnn(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    for backend in ("pallas", "pallas_train"):
        with pytest.raises(ValueError, match="Pallas TPU kernels"):
            rnn_apply(params, cfg, x, backend=backend)
