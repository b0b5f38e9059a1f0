"""Fused Pallas TRAINING kernels (ops/lstm_train_pallas.py): forward and
gradient parity against the XLA scan path, including masked ragged
batches and carried initial state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn.lstm import init_lstm_layer, lstm_forward
from mobileposer_tpu.ops.lstm_train_pallas import lstm_forward_train_pallas


def _params(key, n_layers, n_in, H, bidirectional):
    keys = jax.random.split(key, n_layers * 2)
    layers = []
    ki = 0
    for li in range(n_layers):
        d_in = n_in if li == 0 else H * (2 if bidirectional else 1)
        dirs = {"fwd": init_lstm_layer(keys[ki], d_in, H)}
        ki += 1
        if bidirectional:
            dirs["bwd"] = init_lstm_layer(keys[ki], d_in, H)
            ki += 1
        layers.append(dirs)
    return layers


@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("ragged", [False, True])
def test_train_kernel_matches_xla(bidirectional, ragged):
    T, B, D, H = 11, 4, 6, 8
    layers = _params(jax.random.PRNGKey(0), 2, D, H, bidirectional)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D)) * 0.5
    lengths = (jnp.asarray([11, 7, 1, 10]) if ragged else None)
    n_dir = 2 if bidirectional else 1
    h0 = jax.random.normal(jax.random.PRNGKey(2), (2 * n_dir, B, H)) * 0.3
    c0 = jax.random.normal(jax.random.PRNGKey(3), (2 * n_dir, B, H)) * 0.3

    def run_xla(layers, x, h0c0):
        return lstm_forward(layers, x, lengths, h0c0,
                            bidirectional=bidirectional, backend="xla")

    def run_pallas(layers, x, h0c0):
        return lstm_forward_train_pallas(layers, x, lengths, h0c0,
                                         bidirectional=bidirectional,
                                         interpret=True)

    y_x, (h_x, c_x) = run_xla(layers, x, (h0, c0))
    y_p, (h_p, c_p) = run_pallas(layers, x, (h0, c0))
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), atol=1e-6)

    # gradient parity on a loss touching outputs AND final carries, wrt
    # params, inputs, and the initial state
    tgt = jax.random.normal(jax.random.PRNGKey(4), y_x.shape)

    def loss(run):
        def fn(layers, x, h0, c0):
            y, (hT, cT) = run(layers, x, (h0, c0))
            return (jnp.mean((y - tgt) ** 2) + 0.1 * jnp.mean(hT ** 2)
                    + 0.05 * jnp.mean(cT ** 2))
        return fn

    g_x = jax.grad(loss(run_xla), argnums=(0, 1, 2, 3))(layers, x, h0, c0)
    g_p = jax.grad(loss(run_pallas), argnums=(0, 1, 2, 3))(layers, x, h0, c0)
    for leaf_x, leaf_p in zip(jax.tree_util.tree_leaves(g_x),
                              jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_x),
                                   atol=1e-5)


def test_train_kernel_masked_final_state_semantics():
    """Masked steps hold the carry: the final state equals the state at
    each sequence's last valid frame, and outputs past the length are 0."""
    T, B, D, H = 9, 3, 5, 8
    layers = _params(jax.random.PRNGKey(5), 1, D, H, False)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, D))
    lengths = jnp.asarray([9, 4, 6])
    y, (hT, cT) = lstm_forward_train_pallas(layers, x, lengths,
                                            bidirectional=False,
                                            interpret=True)
    y_np = np.asarray(y)
    for b, L in enumerate([9, 4, 6]):
        assert np.all(y_np[b, L:] == 0.0)
        # truncated run reproduces the final carry
        y2, (h2, c2) = lstm_forward_train_pallas(
            layers, x[b:b + 1, :L], None, bidirectional=False,
            interpret=True)
        np.testing.assert_allclose(np.asarray(hT[:, b]),
                                   np.asarray(h2[:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cT[:, b]),
                                   np.asarray(c2[:, 0]), atol=1e-6)


def test_train_kernel_bf16_residuals():
    """residual_dtype=bf16 (backend='auto_train_bf16res'): outputs match
    f32 exactly (the forward math is unchanged — only STORED residuals
    round), gradients match XLA to bf16 precision (~1e-2 relative)."""
    T, B, D, H = 11, 4, 6, 8
    layers = _params(jax.random.PRNGKey(0), 2, D, H, True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D)) * 0.5
    lengths = jnp.asarray([11, 7, 1, 10])

    def loss_of(backend_kwargs):
        def loss(layers, x):
            y, (h, c) = lstm_forward_train_pallas(
                layers, x, lengths, None, bidirectional=True,
                interpret=True, **backend_kwargs)
            return (y ** 2).sum() + (h * c).sum()
        return loss

    v16, g16 = jax.value_and_grad(
        loss_of({"residual_dtype": jnp.bfloat16}), argnums=(0, 1))(layers, x)
    v32, g32 = jax.value_and_grad(
        loss_of({}), argnums=(0, 1))(layers, x)
    # forward identical: residual rounding does not touch the outputs
    np.testing.assert_allclose(float(v16), float(v32), rtol=1e-6)
    # grads at bf16 precision
    for a, b in zip(jax.tree_util.tree_leaves(g16),
                    jax.tree_util.tree_leaves(g32)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-3, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) / denom < 3e-2
