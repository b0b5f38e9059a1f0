"""Slow integration test: the full loop learns.

Trains the joints module briefly on synthetic data and verifies the
evaluation metric (joint position error through the real eval machinery)
improves over the untrained initialization — the end-to-end analogue of
the reference's overfit sanity check."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.models import module_apply
from mobileposer_tpu.train import init_train_state, make_train_step


def test_training_improves_joint_error(tmp_path):
    body = ParametricModel.synthetic(num_vertices=240)
    f = tmp_path / "synth.pt"
    make_synthetic_processed_dataset(f, n_sequences=2, T=150, seed=0,
                                     body_model=body)
    ds = PoseDataset(fold="train", body_model=body, data_files=[f],
                     combos=["lw_rp"])
    batch = ds._assemble(np.arange(4), C.datasets.window_length)

    def joint_err(params):
        pred, _ = module_apply("joints", params, jnp.asarray(batch["imu"]))
        pred = np.asarray(pred).reshape(4, -1, 24, 3)
        tgt = batch["joints"].reshape(4, -1, 24, 3)
        L = batch["lengths"]
        errs = [np.linalg.norm(pred[b, :L[b]] - tgt[b, :L[b]], axis=2).mean()
                for b in range(4)]
        return float(np.mean(errs))

    state = init_train_state("joints", jax.random.PRNGKey(0), lr=1e-3)
    err_before = joint_err(state.params)

    step = make_train_step("joints", lr=1e-3)
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)

    err_after = joint_err(state.params)
    assert err_after < err_before * 0.7, (err_before, err_after)
