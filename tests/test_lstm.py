"""Parity tests for the scan-LSTM core against a PyTorch replica of the
reference RNN block (mobileposer/models/rnn.py:9-33): linear1 -> relu ->
LSTM (bi/uni, 2 layers) -> linear2, with packed-sequence support."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mobileposer_tpu.nn import (
    LSTMConfig, convert_rnn_state_dict, rnn_apply, rnn_zero_state,
    export_to_npz, load_from_npz,
)


class TorchRNN(nn.Module):
    """Replica of the reference RNN block, built from the SURVEY spec."""

    def __init__(self, cfg: LSTMConfig):
        super().__init__()
        self.rnn = nn.LSTM(cfg.n_hidden, cfg.n_hidden, cfg.n_layers,
                           bidirectional=cfg.bidirectional)
        self.linear1 = nn.Linear(cfg.n_input, cfg.n_hidden)
        n_dir = 2 if cfg.bidirectional else 1
        self.linear2 = nn.Linear(cfg.n_hidden * n_dir, cfg.n_output)

    def forward(self, x, seq_lengths=None, h=None):
        # The reference constructs nn.LSTM without batch_first and ALWAYS
        # calls it through the packed path (evaluate.py:58 passes
        # [x.shape[0]]; training passes window lengths), so batch-major
        # semantics come from pack_padded_sequence(batch_first=True). We
        # replicate exactly that.
        if seq_lengths is None:
            seq_lengths = [x.shape[1]] * x.shape[0]
        data = torch.relu(self.linear1(x))
        data = nn.utils.rnn.pack_padded_sequence(
            data, seq_lengths, batch_first=True, enforce_sorted=False)
        data, h = self.rnn(data, h)
        data, _ = nn.utils.rnn.pad_packed_sequence(data, batch_first=True)
        return self.linear2(data), h


def _convert(tm, cfg):
    sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
    return convert_rnn_state_dict(sd, "m", cfg)


CFGS = [
    LSTMConfig(12, 7, 16, bidirectional=True),
    LSTMConfig(12, 7, 16, bidirectional=False),
    LSTMConfig(5, 3, 8, n_layers=1, bidirectional=True),
]


@pytest.mark.parametrize("cfg", CFGS)
def test_full_length_parity(cfg):
    torch.manual_seed(1)
    tm = TorchRNN(cfg).eval()
    params = _convert(tm, cfg)
    x = torch.randn(3, 11, cfg.n_input)
    with torch.no_grad():
        y_t, _ = tm(x)
    y_j, _ = rnn_apply(params, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-5)


@pytest.mark.parametrize("cfg", CFGS)
def test_variable_length_parity(cfg):
    """Masked-scan outputs must match torch packed sequences on valid frames."""
    torch.manual_seed(2)
    tm = TorchRNN(cfg).eval()
    params = _convert(tm, cfg)
    B, T = 4, 13
    lengths = [13, 9, 5, 1]
    x = torch.randn(B, T, cfg.n_input)
    for b, l in enumerate(lengths):
        x[b, l:] = 0.0
    with torch.no_grad():
        y_t, _ = tm(x, seq_lengths=lengths)
    y_j, _ = rnn_apply(params, cfg, jnp.asarray(x.numpy()),
                       lengths=jnp.asarray(lengths))
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(y_j)[b, :l], y_t.numpy()[b, :l],
                                   atol=2e-5, err_msg=f"seq {b}")


def test_carried_state_parity():
    """Unidirectional carry: chunked inference with threaded (h, c) must
    equal one full pass (the streaming Velocity semantics, velocity.py:45)."""
    cfg = LSTMConfig(12, 7, 16, bidirectional=False)
    torch.manual_seed(3)
    tm = TorchRNN(cfg).eval()
    params = _convert(tm, cfg)
    x = np.random.RandomState(0).randn(1, 20, cfg.n_input).astype(np.float32)

    y_full, _ = rnn_apply(params, cfg, jnp.asarray(x))
    hc = rnn_zero_state(cfg, 1)
    chunks = []
    for t0 in range(0, 20, 5):
        y, hc = rnn_apply(params, cfg, jnp.asarray(x[:, t0:t0 + 5]), h0c0=hc)
        chunks.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(chunks, 1), np.asarray(y_full),
                               atol=1e-5)
    # And the carry itself matches torch.
    with torch.no_grad():
        _, (h_t, c_t) = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(hc[0]), h_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hc[1]), c_t.numpy(), atol=2e-5)


def test_initial_state_parity():
    """Nonzero h0/c0 must round-trip identically through torch and jax."""
    cfg = LSTMConfig(6, 4, 8, bidirectional=True)
    torch.manual_seed(4)
    tm = TorchRNN(cfg).eval()
    params = _convert(tm, cfg)
    B, T = 2, 6
    n_states = cfg.n_layers * 2
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, cfg.n_input).astype(np.float32)
    h0 = rng.randn(n_states, B, cfg.n_hidden).astype(np.float32)
    c0 = rng.randn(n_states, B, cfg.n_hidden).astype(np.float32)
    with torch.no_grad():
        y_t, _ = tm(torch.from_numpy(x),
                    h=(torch.from_numpy(h0), torch.from_numpy(c0)))
    y_j, _ = rnn_apply(params, cfg, jnp.asarray(x),
                       h0c0=(jnp.asarray(h0), jnp.asarray(c0)))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-5)


def test_npz_roundtrip(tmp_path):
    cfg = LSTMConfig(5, 3, 8)
    torch.manual_seed(5)
    tm = TorchRNN(cfg).eval()
    params = _convert(tm, cfg)
    path = str(tmp_path / "w.npz")
    export_to_npz({"poser": params}, path)
    restored = load_from_npz(path)["poser"]
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4, 5).astype(np.float32))
    y1, _ = rnn_apply(params, cfg, x)
    y2, _ = rnn_apply(restored, cfg, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_dropout_train_mode():
    """Dropout only active in train mode; train mode is still jittable."""
    cfg = LSTMConfig(5, 3, 8, dropout=0.4)
    params_key = jax.random.PRNGKey(0)
    from mobileposer_tpu.nn import init_rnn
    params = init_rnn(params_key, cfg)
    x = jnp.ones((2, 4, 5))
    y_eval, _ = rnn_apply(params, cfg, x)
    fn = jax.jit(lambda p, x, k: rnn_apply(p, cfg, x, train=True,
                                           dropout_rng=k)[0])
    y_train = fn(params, x, jax.random.PRNGKey(1))
    assert y_eval.shape == y_train.shape
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))


@pytest.mark.parametrize("cfg", CFGS)
def test_reverse_export_loads_into_torch(cfg):
    """export_rnn_state_dict is the exact inverse mapping: our params load
    into the torch replica with strict key checking, and the torch forward
    matches ours — the parity-day path for evaluating a checkpoint trained
    HERE with the reference implementation."""
    from mobileposer_tpu.nn import export_rnn_state_dict
    from mobileposer_tpu.nn.lstm import init_rnn
    params = init_rnn(jax.random.PRNGKey(3), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)
    sd = {k[len("m."):]: torch.from_numpy(v)
          for k, v in export_rnn_state_dict(params, "m").items()}
    tm = TorchRNN(cfg)
    tm.load_state_dict(sd, strict=True)    # exact key/shape coverage
    x = np.random.RandomState(0).randn(3, 11, cfg.n_input).astype(np.float32)
    with torch.no_grad():
        y_t, _ = tm(torch.from_numpy(x))
    y_j, _ = rnn_apply(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-5)


def test_torch_checkpoint_roundtrip(tmp_path):
    """save_torch_checkpoint -> torch.load -> convert_mobileposer_checkpoint
    reproduces the original params pytree exactly (both directions are
    transpose-only)."""
    from mobileposer_tpu.models import MODULE_CONFIGS, init_all_modules
    from mobileposer_tpu.nn import convert_mobileposer_checkpoint
    from mobileposer_tpu.nn.torch_convert import save_torch_checkpoint
    params = jax.tree_util.tree_map(
        np.asarray, init_all_modules(jax.random.PRNGKey(4)))
    path = tmp_path / "ref_format.pt"
    save_torch_checkpoint(params, str(path))
    sd = torch.load(path, map_location="cpu", weights_only=False)
    back = convert_mobileposer_checkpoint(sd, MODULE_CONFIGS)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for key, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[key]), err_msg=str(key))
