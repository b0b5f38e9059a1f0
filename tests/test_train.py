"""Tests for the training loop, sharded train step, and checkpointing."""

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
    Checkpointer, TrainingManager, combine_weights, get_best_checkpoint,
    get_checkpoint_path, init_train_state, load_combined_weights,
    make_train_step,
)


@pytest.fixture(scope="module")
def body():
    return ParametricModel.synthetic(num_vertices=240)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory, body):
    path = tmp_path_factory.mktemp("train_data") / "synth.pt"
    make_synthetic_processed_dataset(path, n_sequences=2, T=150, seed=0,
                                     body_model=body)
    # restrict to 2 combos to keep the test small
    return PoseDataset(fold="train", body_model=body, data_files=[path],
                       combos=["lw_rp", "rp"])


def test_train_step_reduces_loss(dataset):
    """A few steps of the joints module on one repeated batch must reduce
    the loss (the overfit-one-batch sanity check, reference overfit.py)."""
    state = init_train_state("joints", jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step("joints", lr=1e-3)
    batch = dataset._assemble(np.arange(4), C.datasets.window_length)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_sharded_train_step_multichip(dataset):
    """The same train step must run batch-sharded over the 8-device CPU
    mesh and agree with the single-device result."""
    mesh = make_mesh()
    assert len(mesh.devices.flatten()) == 8
    state = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step("footcontact", lr=1e-3)
    batch = dataset._assemble(np.arange(8), C.datasets.window_length)

    sharded = shard_batch(pad_batch_to_multiple(batch, 8), mesh)
    state_s, loss_s = step(state, sharded, jax.random.PRNGKey(2))

    state2 = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    state_r, loss_r = step(state2, batch, jax.random.PRNGKey(2))
    # Identical params/batch/rng -> identical loss regardless of sharding.
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)


def test_shard_map_train_step_multichip(dataset):
    """The explicitly-partitioned (shard_map) DP step — the variant that
    composes with the fused Pallas training kernels on real multi-chip
    meshes — runs over the 8-device CPU mesh, updates parameters, and
    decreases the loss."""
    from mobileposer_tpu.train import make_shard_map_train_step
    mesh = make_mesh()
    state = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    state = state._replace(params=jax.tree_util.tree_map(
        jnp.asarray, state.params))
    step = make_shard_map_train_step("footcontact", lr=1e-3, mesh=mesh)
    batch = dataset._assemble(np.arange(8), C.datasets.window_length)
    batch = shard_batch(pad_batch_to_multiple(batch, 8), mesh)
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_shard_map_step_matches_gspmd_on_one_device(dataset):
    """On a 1-device mesh the shard_map step sees the full batch, so its
    loss must equal the plain GSPMD step's bit-for-bit (the shard_map step
    folds the device index into the rng, so the oracle uses fold_in(rng,
    0) — same key, same full-batch dropout geometry at one device)."""
    from mobileposer_tpu.train import make_shard_map_train_step
    mesh = make_mesh(1)
    batch = dataset._assemble(np.arange(4), C.datasets.window_length)
    rng = jax.random.PRNGKey(5)

    state_a = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    step_a = make_shard_map_train_step("footcontact", lr=1e-3, mesh=mesh,
                                       backend="xla")
    _, loss_a = step_a(state_a, shard_batch(batch, mesh), rng)

    state_b = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    step_b = make_train_step("footcontact", lr=1e-3, backend="xla")
    _, loss_b = step_b(state_b, batch, jax.random.fold_in(rng, 0))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_shard_map_step_distinct_noise_per_shard(dataset):
    """Each device must draw DIFFERENT augmentation noise for its rows: a
    batch of 8 identical samples sharded over 8 devices must not produce 8
    identical per-shard gradients (which an unfolded rng would)."""
    from mobileposer_tpu.train import make_shard_map_train_step
    from mobileposer_tpu.parallel.mesh import DATA_AXIS
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh()
    batch = dataset._assemble(np.arange(1), C.datasets.window_length)
    batch8 = {k: np.repeat(np.asarray(v), 8, axis=0) for k, v in batch.items()}
    from mobileposer_tpu.train.trainer import loss_fn_for
    loss_fn = loss_fn_for("footcontact", backend="xla")

    def per_shard_loss(batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        params = init_train_state("footcontact", jax.random.PRNGKey(0),
                                  1e-3).params
        return loss_fn(params, batch, rng, train=True)[None]

    losses = jax.jit(jax.shard_map(
        per_shard_loss, mesh=mesh, in_specs=(P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS), check_vma=False))(
            shard_batch(batch8, mesh), jax.random.PRNGKey(7))
    losses = np.asarray(losses)
    # identical inputs + params; only the folded rng differs per shard
    assert len(np.unique(np.round(losses, 10))) > 1


def test_training_manager_fast_dev_run(dataset, body, tmp_path):
    mgr = TrainingManager(fast_dev_run=True,
                          hypers=C.TrainHypers(batch_size=4, num_epochs=1))
    out = mgr.train_module("velocity", dataset, tmp_path, body_model=body)
    assert len(out["history"]["train_loss"]) == 1
    assert np.isfinite(out["history"]["train_loss"][0])
    assert get_best_checkpoint(tmp_path / "velocity") is not None


def test_training_manager_shard_map_impl(dataset, body, tmp_path):
    """dp_impl='shard_map' trains end-to-end over the 8-device mesh."""
    mgr = TrainingManager(fast_dev_run=True, dp_impl="shard_map",
                          hypers=C.TrainHypers(batch_size=8, num_epochs=1))
    out = mgr.train_module("footcontact", dataset, tmp_path,
                           body_model=body)
    assert np.isfinite(out["history"]["train_loss"][0])
    assert get_best_checkpoint(tmp_path / "footcontact") is not None


def test_checkpointer_topk(tmp_path):
    ck = Checkpointer(tmp_path, top_k=2)
    params = {"linear1": {"w": np.ones((2, 2)), "b": np.zeros(2)}}
    ck.save(params, 0, 1.0)
    ck.save(params, 1, 0.5)
    ck.save(params, 2, 2.0)
    files = sorted(p.name for p in tmp_path.glob("*.npz"))
    assert len(files) == 2
    assert ck.best().name == "epoch=1-valloss=0.5000.npz"


def test_combine_weights_roundtrip(dataset, body, tmp_path):
    """Best checkpoints of all four modules merge into one loadable file."""
    mgr = TrainingManager(fast_dev_run=True,
                          hypers=C.TrainHypers(batch_size=4, num_epochs=1))
    for name in ("poser", "joints", "footcontact", "velocity"):
        mgr.train_module(name, dataset, tmp_path, body_model=body)
    out = combine_weights(tmp_path)
    params = load_combined_weights(out)
    assert set(params.keys()) == {"poser", "joints", "footcontact", "velocity"}
    # loadable into the composite forward
    from mobileposer_tpu.models import forward
    imu = jnp.zeros((1, 8, 60))
    pose, joints, vel, contact, _ = forward(params, imu, body)
    assert pose.shape == (1, 8, 24, 3, 3)


def test_get_checkpoint_path(tmp_path):
    p1 = get_checkpoint_path(tmp_path)
    assert p1.name == "1"
    p1.mkdir()
    assert get_checkpoint_path(tmp_path).name == "2"


def test_training_state_resume(dataset, tmp_path):
    """Full-state checkpointing must resume exactly: optimizer state and
    step counter included."""
    from mobileposer_tpu.train import (
        make_train_step, restore_training_state, save_training_state)
    state = init_train_state("footcontact", jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step("footcontact", lr=1e-3)
    batch = dataset._assemble(np.arange(4), C.datasets.window_length)
    key = jax.random.PRNGKey(9)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, _ = step(state, batch, sub)
    save_training_state(tmp_path / "ts.npz", "footcontact", state, epoch=2)

    restored, module, next_epoch = restore_training_state(
        tmp_path / "ts.npz", lr=1e-3)
    assert module == "footcontact"
    assert next_epoch == 3
    assert int(restored.step) == 3
    # one more step from each must agree exactly
    key2 = jax.random.PRNGKey(10)
    s1, l1 = step(state, batch, key2)
    s2, l2 = step(restored, batch, key2)
    np.testing.assert_allclose(float(l1), float(l2), rtol=0)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_manager_resume(dataset, body, tmp_path):
    """train_module(resume_from=...) continues at the saved epoch."""
    hyp = C.TrainHypers(batch_size=4, num_epochs=2)
    mgr = TrainingManager(hypers=hyp)
    out = mgr.train_module("footcontact", dataset, tmp_path, body_model=body)
    assert len(out["history"]["train_loss"]) == 2
    ts = tmp_path / "footcontact" / "train_state.npz"
    assert ts.exists()
    mgr3 = TrainingManager(hypers=C.TrainHypers(batch_size=4, num_epochs=3))
    out3 = mgr3.train_module("footcontact", dataset, tmp_path,
                             body_model=body, resume_from=ts)
    # resumed at epoch 2 -> exactly one more epoch
    assert len(out3["history"]["train_loss"]) == 1


def test_nan_loss_does_not_poison_params(dataset):
    """A batch producing a non-finite loss must leave parameters and
    optimizer state untouched (failure containment)."""
    state = init_train_state("joints", jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step("joints", lr=1e-3)
    batch = dataset._assemble(np.arange(2), C.datasets.window_length)
    bad = dict(batch, imu=np.full_like(batch["imu"], np.nan))
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, loss = step(state, bad, jax.random.PRNGKey(1))
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and training continues normally afterwards
    state3, loss3 = step(state2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss3))


def test_training_is_deterministic(dataset):
    """Two runs from the same seed produce bit-identical losses and params
    (the reference pins determinism via seed_everything; here it falls out
    of explicit PRNG keys)."""
    def run():
        state = init_train_state("footcontact", jax.random.PRNGKey(7), 1e-3)
        step = make_train_step("footcontact", lr=1e-3)
        batch = dataset._assemble(np.arange(4), C.datasets.window_length)
        key = jax.random.PRNGKey(8)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub)
            losses.append(float(loss))
        return losses, jax.tree_util.tree_map(np.asarray, state.params)

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_time_major_losses_match_batch_major(dataset, body, monkeypatch):
    """time_major=True on [T, B, ...] batches must compute the same loss as
    batch-major (noise zeroed: the rng draws differ by layout)."""
    from mobileposer_tpu.models import modules as M
    from mobileposer_tpu.train.trainer import loss_fn_for
    monkeypatch.setattr(M, "NOISE_STD",
                        {k: 0.0 for k in M.NOISE_STD})
    bm = dataset._assemble(np.arange(4), C.datasets.window_length)
    tm = {k: (v if np.ndim(v) == 1 else np.swapaxes(v, 0, 1))
          for k, v in bm.items()}
    # exercise the masked paths too
    bm["lengths"] = tm["lengths"] = np.array([125, 100, 80, 125], np.int32)
    rng = jax.random.PRNGKey(3)
    for name in ("joints", "poser", "footcontact", "velocity"):
        params = init_train_state(name, jax.random.PRNGKey(0), 1e-3).params
        loss_fn = loss_fn_for(name, body if name == "poser" else None)
        l_bm = float(loss_fn(params, bm, rng, train=False))
        l_tm = float(loss_fn(params, tm, rng, train=False, time_major=True))
        np.testing.assert_allclose(l_tm, l_bm, rtol=2e-5, err_msg=name)


def test_time_major_train_step_learns(dataset):
    state = init_train_state("joints", jax.random.PRNGKey(0), lr=1e-3)
    step = make_train_step("joints", lr=1e-3, time_major=True)
    bm = dataset._assemble(np.arange(4), C.datasets.window_length)
    tm = {k: (v if np.ndim(v) == 1 else
              np.ascontiguousarray(np.swapaxes(v, 0, 1)))
          for k, v in bm.items()}
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = step(state, tm, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pad_and_shard_time_major():
    mesh = make_mesh(8)
    batch = {"imu": np.zeros((125, 6, 60), np.float32),
             "lengths": np.full((6,), 125, np.int32)}
    padded = pad_batch_to_multiple(batch, 8, batch_dim=1)
    assert padded["imu"].shape == (125, 8, 60)
    assert padded["lengths"].shape == (8,)
    sharded = shard_batch(padded, mesh, batch_dim=1)
    assert sharded["imu"].sharding.spec == jax.sharding.PartitionSpec(
        None, "data")
    assert sharded["lengths"].sharding.spec == jax.sharding.PartitionSpec(
        "data")
