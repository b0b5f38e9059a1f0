"""Fused trio path vs per-module applies (exact equivalence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.models import MODULE_CONFIGS, init_all_modules, module_apply
from mobileposer_tpu.models.fused import trio_apply
from mobileposer_tpu.nn.lstm import rnn_zero_state
from mobileposer_tpu.ops.multicell_pallas import multicell_lstm_pallas


def test_trio_apply_matches_modules():
    params = init_all_modules(jax.random.PRNGKey(0))
    T, B = 13, 3
    x132 = jax.random.normal(jax.random.PRNGKey(1), (T, B, 132)) * 0.1
    hc = rnn_zero_state(MODULE_CONFIGS["velocity"], B)
    # perturb the carry so carry-threading is actually exercised
    hc = (hc[0] + 0.01, hc[1] - 0.02)

    r6d_f, contact_f, vel_f, hc_f = trio_apply(params, x132, hc,
                                               interpret=True)

    r6d_ref, _ = module_apply("poser", params["poser"], x132, time_major=True)
    contact_ref, _ = module_apply("footcontact", params["footcontact"], x132,
                                  time_major=True)
    vel_ref, hc_ref = module_apply("velocity", params["velocity"], x132,
                                   h0c0=hc, time_major=True)

    np.testing.assert_allclose(np.asarray(r6d_f), np.asarray(r6d_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(contact_f), np.asarray(contact_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(vel_f), np.asarray(vel_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(hc_f[0]), np.asarray(hc_ref[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(hc_f[1]), np.asarray(hc_ref[1]),
                               atol=2e-5)


def test_multicell_chunked_carry():
    """Carry threading through the multicell kernel across chunks equals one
    full pass (streaming semantics for the velocity slot)."""
    from mobileposer_tpu.nn.lstm import _lstm_scan, init_lstm_layer
    H, B, T = 8, 2, 12
    layer = init_lstm_layer(jax.random.PRNGKey(2), H, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, 4 * H)) * 0.1
    y_ref, _ = _lstm_scan(x, layer["w_hh"], jnp.zeros((B, H)),
                          jnp.zeros((B, H)), None)
    h = c = jnp.zeros((B, H))
    chunks = []
    for t0 in range(0, T, 4):
        ys, hts, cts = multicell_lstm_pallas(
            x[t0:t0 + 4], (layer["w_hh"],), (h,), (c,), (H,), interpret=True)
        chunks.append(np.asarray(ys[0]))
        h, c = hts[0], cts[0]
    np.testing.assert_allclose(np.concatenate(chunks), np.asarray(y_ref),
                               atol=1e-5)
