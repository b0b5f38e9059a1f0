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
