"""RNN with a learned initial hidden state (PIP-style).

Behavioral parity target: reference `articulate/utils/torch/rnn.py:62-110`
(`RNNWithInit`): a 3-layer MLP regresses the LSTM's initial (h, c) from a
per-sequence init vector (e.g. the first frame's ground-truth joints), then
the sequence runs through the normal RNN block. Unused by the reference's
main model but part of its library surface; here it composes directly with
the scan LSTM core.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn.lstm import (
    LSTMConfig, init_linear, init_rnn, rnn_apply)


class RNNWithInitConfig(NamedTuple):
    rnn: LSTMConfig
    n_init: int                      # init-vector dimension

    @property
    def n_state(self) -> int:
        n_dir = 2 if self.rnn.bidirectional else 1
        return 2 * self.rnn.n_layers * n_dir * self.rnn.n_hidden


def init_rnn_with_init(key: jax.Array, cfg: RNNWithInitConfig,
                       dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hid = cfg.n_state
    return {
        "rnn": init_rnn(k1, cfg.rnn, dtype),
        # init_net: Linear(n_init, hid) -> ReLU -> Linear(hid, 2*hid) ->
        # ReLU -> Linear(2*hid, hid)  (reference: rnn.py:86-91)
        "init1": init_linear(k2, cfg.n_init, hid, dtype),
        "init2": init_linear(k3, hid, 2 * hid, dtype),
        "init3": init_linear(k4, 2 * hid, hid, dtype),
    }


def rnn_with_init_apply(params: dict, cfg: RNNWithInitConfig,
                        x: jnp.ndarray, init_vec: jnp.ndarray,
                        lengths: Optional[jnp.ndarray] = None,
                        train: bool = False,
                        dropout_rng: Optional[jax.Array] = None):
    """x: [B, T, n_input]; init_vec: [B, n_init]. Returns (y, (h_T, c_T))."""
    B = x.shape[0]
    h = jax.nn.relu(init_vec @ params["init1"]["w"] + params["init1"]["b"])
    h = jax.nn.relu(h @ params["init2"]["w"] + params["init2"]["b"])
    state = h @ params["init3"]["w"] + params["init3"]["b"]   # [B, n_state]
    n_dir = 2 if cfg.rnn.bidirectional else 1
    n_stack = cfg.rnn.n_layers * n_dir
    hc = state.reshape(B, 2, n_stack, cfg.rnn.n_hidden)
    h0 = jnp.transpose(hc[:, 0], (1, 0, 2))
    c0 = jnp.transpose(hc[:, 1], (1, 0, 2))
    return rnn_apply(params["rnn"], cfg.rnn, x, lengths, (h0, c0),
                     train=train, dropout_rng=dropout_rng)
