"""End-to-end network parity: the full 4-module chain (joints -> poser /
footcontact / velocity with carried state) against a PyTorch replica wired
exactly like the reference MobilePoserNet.forward (net.py:101-119),
using converted weights. Catches composition-level drift the per-module
LSTM tests can't (concat wiring, carry threading, layout changes)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from mobileposer_tpu.models import MODULE_CONFIGS, module_apply
from mobileposer_tpu.nn import convert_rnn_state_dict
from mobileposer_tpu.nn.lstm import rnn_zero_state


class TorchRNN(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.rnn = nn.LSTM(cfg.n_hidden, cfg.n_hidden, cfg.n_layers,
                           bidirectional=cfg.bidirectional)
        self.linear1 = nn.Linear(cfg.n_input, cfg.n_hidden)
        n_dir = 2 if cfg.bidirectional else 1
        self.linear2 = nn.Linear(cfg.n_hidden * n_dir, cfg.n_output)

    def forward(self, x, lengths=None, h=None):
        if lengths is None:
            lengths = [x.shape[1]] * x.shape[0]
        data = torch.relu(self.linear1(x))
        data = nn.utils.rnn.pack_padded_sequence(
            data, lengths, batch_first=True, enforce_sorted=False)
        data, h = self.rnn(data, h)
        data, _ = nn.utils.rnn.pad_packed_sequence(data, batch_first=True)
        return self.linear2(data), h


def test_four_module_chain_parity():
    torch.manual_seed(0)
    tmods = {name: TorchRNN(cfg).eval()
             for name, cfg in MODULE_CONFIGS.items()}
    params = {}
    for name, tm in tmods.items():
        sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
        params[name] = convert_rnn_state_dict(sd, "m", MODULE_CONFIGS[name])

    B, T = 2, 45
    imu = torch.randn(B, T, 60) * 0.1

    # torch chain, wired like reference net.forward (velocity with carry)
    with torch.no_grad():
        t_joints, _ = tmods["joints"](imu)
        x132 = torch.cat([t_joints, imu], dim=-1)
        t_r6d, _ = tmods["poser"](x132)
        t_contact, _ = tmods["footcontact"](x132)
        vel_state = None
        t_vel_chunks = []
        for chunk in torch.split(x132, 15, dim=1):   # carried across chunks
            v, vel_state = tmods["velocity"](chunk, h=vel_state)
            t_vel_chunks.append(v)
        t_vel = torch.cat(t_vel_chunks, dim=1)

    # jax chain (time-major internals + auto backend happen inside)
    imu_j = jnp.asarray(imu.numpy())
    j_joints, _ = module_apply("joints", params["joints"], imu_j)
    x132_j = jnp.concatenate([j_joints, imu_j], axis=-1)
    j_r6d, _ = module_apply("poser", params["poser"], x132_j)
    j_contact, _ = module_apply("footcontact", params["footcontact"], x132_j)
    hc = rnn_zero_state(MODULE_CONFIGS["velocity"], B)
    j_vel_chunks = []
    for t0 in range(0, T, 15):
        v, hc = module_apply("velocity", params["velocity"],
                             x132_j[:, t0:t0 + 15], h0c0=hc)
        j_vel_chunks.append(np.asarray(v))
    j_vel = np.concatenate(j_vel_chunks, axis=1)

    np.testing.assert_allclose(np.asarray(j_joints), t_joints.numpy(),
                               atol=3e-5, err_msg="joints")
    np.testing.assert_allclose(np.asarray(j_r6d), t_r6d.numpy(),
                               atol=3e-5, err_msg="poser r6d")
    np.testing.assert_allclose(np.asarray(j_contact), t_contact.numpy(),
                               atol=3e-5, err_msg="contact")
    np.testing.assert_allclose(j_vel, t_vel.numpy(), atol=3e-5,
                               err_msg="velocity")


def test_chain_parity_variable_lengths():
    """Same chain under ragged batches (masked scan vs packed sequences)."""
    torch.manual_seed(1)
    tmods = {name: TorchRNN(cfg).eval()
             for name, cfg in MODULE_CONFIGS.items()}
    params = {}
    for name, tm in tmods.items():
        sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
        params[name] = convert_rnn_state_dict(sd, "m", MODULE_CONFIGS[name])

    B, T = 3, 20
    lengths = [20, 13, 6]
    imu = torch.randn(B, T, 60) * 0.1
    for b, l in enumerate(lengths):
        imu[b, l:] = 0.0

    with torch.no_grad():
        t_joints, _ = tmods["joints"](imu, lengths)
        x132 = torch.cat([t_joints, imu], dim=-1)
        t_r6d, _ = tmods["poser"](x132, lengths)

    imu_j = jnp.asarray(imu.numpy())
    lj = jnp.asarray(lengths)
    j_joints, _ = module_apply("joints", params["joints"], imu_j, lengths=lj)
    x132_j = jnp.concatenate([j_joints, imu_j], axis=-1)
    j_r6d, _ = module_apply("poser", params["poser"], x132_j, lengths=lj)

    for b, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(j_joints)[b, :l],
                                   t_joints.numpy()[b, :l], atol=3e-5)
        np.testing.assert_allclose(np.asarray(j_r6d)[b, :l],
                                   t_r6d.numpy()[b, :l], atol=3e-5)
