"""Tests for the concurrent multi-module train step and train_all recipe.

The reference trains its four modules sequentially (four passes over the
dataset, train.py:153-154); `make_multi_train_step` advances all of them in
one jit region on one batch. These tests pin (a) exact agreement with the
per-module steps, (b) the end-to-end train_all recipe (checkpoint layout,
combine_weights, resume), and (c) the sharded variant on the 8-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.data import PoseDataset
from mobileposer_tpu.data.fixtures import make_synthetic_processed_dataset
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.parallel import make_mesh, pad_batch_to_multiple, shard_batch
from mobileposer_tpu.train import (
    TrainingManager, combine_weights, init_train_state, load_combined_weights,
    make_train_step,
)
from mobileposer_tpu.train.trainer import MODULE_NAMES, make_multi_train_step


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, body):
    path = tmp_path_factory.mktemp("train_data") / "synth.pt"
    make_synthetic_processed_dataset(path, n_sequences=2, T=150, seed=0,
                                     body_model=body)
    return PoseDataset(fold="train", body_model=body, data_files=[path],
                       combos=["lw_rp", "rp"])


def test_multi_step_matches_per_module_steps(dataset, body):
    """One fused step == four independent per-module steps: the parameter
    trees are disjoint, so grad-of-sum is each module's own gradient and
    every update (incl. the per-module optimizer) must agree."""
    batch = dataset._assemble(np.arange(4), C.datasets.window_length)
    rng = jax.random.PRNGKey(3)

    def fresh_states():
        return {n: init_train_state(n, jax.random.fold_in(
            jax.random.PRNGKey(0), i), lr=1e-3)
            for i, n in enumerate(MODULE_NAMES)}

    multi = make_multi_train_step(1e-3, body)
    # the fused step donates its input states — build them per call
    new_states, losses = multi(fresh_states(), batch, rng)

    states = fresh_states()
    for i, n in enumerate(MODULE_NAMES):
        step = make_train_step(n, lr=1e-3, body_model=body)
        # the fused step folds the shared rng per module in name order
        st, loss = step(states[n], batch, jax.random.fold_in(rng, i))
        np.testing.assert_allclose(float(losses[n]), float(loss),
                                   rtol=1e-6, err_msg=n)
        for a, b in zip(jax.tree_util.tree_leaves(new_states[n].params),
                        jax.tree_util.tree_leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7, err_msg=n)
        assert int(new_states[n].step) == 1


def test_multi_step_containment_is_per_module(dataset, body):
    """A non-finite gradient in ONE module must freeze only that module's
    parameters; the others keep training on the same batch."""
    batch = dataset._assemble(np.arange(2), C.datasets.window_length)
    states = {n: init_train_state(n, jax.random.PRNGKey(1), lr=1e-3)
              for n in MODULE_NAMES}
    # poison the joints module's parameters -> its loss/grads go non-finite
    bad = states["joints"]
    leaves, treedef = jax.tree_util.tree_flatten(bad.params)
    leaves = [jnp.full_like(l, jnp.nan) for l in leaves]
    states["joints"] = bad._replace(
        params=jax.tree_util.tree_unflatten(treedef, leaves))
    # snapshot before the donating call invalidates the input buffers
    before = {n: [np.array(l) for l in
                  jax.tree_util.tree_leaves(states[n].params)]
              for n in MODULE_NAMES}

    multi = make_multi_train_step(1e-3, body)
    new_states, losses = multi(states, batch, jax.random.PRNGKey(2))
    assert not np.isfinite(float(losses["joints"]))
    # joints frozen (NaN params kept, not updated to new NaNs via optimizer)
    # ... and the healthy modules actually moved
    for n in ("poser", "footcontact", "velocity"):
        assert np.isfinite(float(losses[n])), n
        moved = any(
            not np.allclose(np.asarray(a), b)
            for a, b in zip(jax.tree_util.tree_leaves(new_states[n].params),
                            before[n]))
        assert moved, n


def test_multi_step_sharded_over_mesh(dataset, body):
    """The explicitly-partitioned variant runs over the 8-device CPU mesh
    and produces finite per-module losses + updated states."""
    mesh = make_mesh()
    assert len(mesh.devices.flatten()) == 8
    batch = shard_batch(pad_batch_to_multiple(
        dataset._assemble(np.arange(8), C.datasets.window_length), 8), mesh)
    states = {n: init_train_state(n, jax.random.PRNGKey(0), lr=1e-3)
              for n in MODULE_NAMES}
    states = {n: s._replace(params=jax.tree_util.tree_map(jnp.asarray,
                                                          s.params))
              for n, s in states.items()}
    multi = make_multi_train_step(1e-3, body, backend="auto_train",
                                  mesh=mesh)
    new_states, losses = multi(states, batch, jax.random.PRNGKey(4))
    for n in MODULE_NAMES:
        assert np.isfinite(float(losses[n])), n
        assert int(new_states[n].step) == 1


def test_train_all_recipe_and_combine(dataset, body, tmp_path):
    """train_all produces the same checkpoint layout as four train_module
    calls: per-module top-k checkpoints that combine_weights can merge."""
    mgr = TrainingManager(fast_dev_run=True,
                          hypers=C.TrainHypers(batch_size=4, num_epochs=1))
    out = mgr.train_all(dataset, tmp_path / "ckpt", body_model=body)
    assert set(out["history"]) == set(MODULE_NAMES)
    for m in MODULE_NAMES:
        assert len(out["history"][m]["train_loss"]) == 1
        assert np.isfinite(out["history"][m]["val_loss"][0])
    combined = combine_weights(tmp_path / "ckpt")
    params = load_combined_weights(combined)
    assert set(params) == set(MODULE_NAMES)


def test_train_all_resume(dataset, body, tmp_path):
    """train_all(resume=True) restores every module's full train state and
    does not retrain completed epochs."""
    hyp = C.TrainHypers(batch_size=4, num_epochs=2)
    mgr = TrainingManager(hypers=hyp)
    out = mgr.train_all(dataset, tmp_path / "ckpt", body_model=body)
    # train_state.npz written at the last epoch for every module
    mgr2 = TrainingManager(hypers=hyp)
    out2 = mgr2.train_all(dataset, tmp_path / "ckpt", body_model=body,
                          resume=True)
    # all epochs were already complete: nothing retrained
    for m in MODULE_NAMES:
        assert out2["history"][m]["train_loss"] == []
        for a, b in zip(jax.tree_util.tree_leaves(out["params"][m]),
                        jax.tree_util.tree_leaves(out2["params"][m])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_backend_option(dataset, body, tmp_path):
    """backend='auto_train_bf16res' threads through the manager (resolves
    to xla off-TPU — the kernel itself is covered by
    tests/test_train_pallas.py::test_train_kernel_bf16_residuals);
    invalid names are rejected."""
    mgr = TrainingManager(fast_dev_run=True,
                          hypers=C.TrainHypers(batch_size=4, num_epochs=1),
                          backend="auto_train_bf16res")
    out = mgr.train_all(dataset, tmp_path / "ckpt", body_model=body)
    for m in MODULE_NAMES:
        assert np.isfinite(out["history"][m]["val_loss"][0])
    with pytest.raises(ValueError, match="backend"):
        TrainingManager(backend="fp8_dreams")


def test_train_all_module_subset(dataset, body, tmp_path):
    """train_all(module_names=subset) builds the fused step for exactly
    that subset (review r3: it used to close over the full MODULE_NAMES
    and KeyError)."""
    mgr = TrainingManager(fast_dev_run=True,
                          hypers=C.TrainHypers(batch_size=4, num_epochs=1))
    subset = ("joints", "poser")
    out = mgr.train_all(dataset, tmp_path / "ckpt", body_model=body,
                        module_names=subset)
    assert set(out["history"]) == set(subset)
    for m in subset:
        assert np.isfinite(out["history"][m]["val_loss"][0])


def test_train_all_resume_rejects_mixed_epochs(dataset, body, tmp_path):
    """A mixed-epoch snapshot set (crash mid-save) must restart fresh, not
    resume with modules at different epochs (review r3)."""
    from mobileposer_tpu.train.trainer import (restore_training_state,
                                               save_training_state)
    hyp = C.TrainHypers(batch_size=4, num_epochs=2)
    mgr = TrainingManager(hypers=hyp)
    mgr.train_all(dataset, tmp_path / "ckpt", body_model=body)
    # corrupt one module's snapshot epoch to simulate a mid-save crash
    p = tmp_path / "ckpt" / "joints" / "train_state.npz"
    st, mod, _ = restore_training_state(p, hyp.lr)
    save_training_state(p, mod, st, epoch=0)
    out = mgr.train_all(dataset, tmp_path / "ckpt", body_model=body,
                        resume=True)
    # fresh restart: all epochs retrained
    for m in MODULE_NAMES:
        assert len(out["history"][m]["train_loss"]) == hyp.num_epochs
