"""Worker for the REAL multi-process distributed test (not collected by
pytest — launched by tests/test_distributed.py as 2 OS processes that form
a jax.distributed cluster over localhost, Gloo collectives between them).

Exercises the exact multi-host recipe documented in
`parallel/distributed.py`: initialize from env -> global mesh over all
hosts' devices -> host-local batch slice -> global-array assembly ->
psum-mean gradient of the framework's LSTM primitive via shard_map.
The gradient must equal the single-process full-batch gradient (every
process can compute that reference locally — the data is seeded).
"""

import os
import sys

# 2 virtual devices per process: REPLACE any inherited device-count flag
# (the pytest parent's conftest exports 8) but keep every other XLA flag
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mobileposer_tpu.parallel import (  # noqa: E402
    DATA_AXIS,
    global_batch_from_host_slices,
    host_local_batch_slice,
    initialize_distributed,
    make_mesh,
    replicate_params,
)

# coordinator address / process count+id come from JAX_* env vars set by
# the parent test — this is the env-wiring path of initialize_distributed
assert initialize_distributed(), "env vars missing, expected multi-process"

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mobileposer_tpu.nn.lstm import init_lstm_layer, lstm_forward  # noqa: E402

N_PROC = jax.process_count()
assert N_PROC == 2, N_PROC
assert jax.local_device_count() == 2
assert jax.device_count() == 4

mesh = make_mesh()  # spans all 4 devices across both processes
GLOBAL_B, T, D, H = 8, 6, 12, 16

# identical seeds on every process: data and params are globally known,
# so each worker can also compute the single-process reference locally
rng = np.random.RandomState(7)
x_all = (rng.randn(GLOBAL_B, T, D) * 0.5).astype(np.float32)
params = [{"fwd": init_lstm_layer(jax.random.PRNGKey(0), D, H)}]

start, size = host_local_batch_slice(GLOBAL_B)
gbatch = global_batch_from_host_slices(
    {"x": x_all[start:start + size]}, mesh)
assert gbatch["x"].shape == (GLOBAL_B, T, D)
params_g = replicate_params(params, mesh)


def local_loss_sum(p, x_shard):
    y, _ = lstm_forward(p, x_shard, bidirectional=False, backend="xla")
    return jnp.sum(y * y)


def global_grad(p, x):
    # per-shard loss sums, psum'd to the global mean: the gradient
    # all-reduce pattern every multi-host DP train step relies on
    def shard_fn(p, x_shard):
        loss, grads = jax.value_and_grad(local_loss_sum)(p, x_shard)
        loss = jax.lax.psum(loss, DATA_AXIS) / GLOBAL_B
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, DATA_AXIS) / GLOBAL_B, grads)
        return loss, grads

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False))(p, x)


loss_g, grads_g = global_grad(params_g, gbatch["x"])

# single-process full-batch reference, computed on this process alone
loss_ref, grads_ref = jax.jit(jax.value_and_grad(
    lambda p, x: local_loss_sum(p, x) / GLOBAL_B))(params, x_all)


def fetch(a):
    return np.asarray(jax.device_get(a.addressable_shards[0].data))


np.testing.assert_allclose(fetch(loss_g), np.asarray(loss_ref), rtol=1e-5)
for g, r in zip(jax.tree_util.tree_leaves(grads_g),
                jax.tree_util.tree_leaves(grads_ref)):
    np.testing.assert_allclose(fetch(g), np.asarray(r),
                               rtol=1e-4, atol=1e-6)

# --- the REAL train step over the same cluster -------------------------
# make_shard_map_train_step is the program a TPU-pod deployment runs; here
# its psum-mean gradient all-reduce crosses OS processes. Every process
# must end with the identical loss and updated params (the parent compares
# the printed digest across workers).
from mobileposer_tpu.train import (  # noqa: E402
    init_train_state,
    make_shard_map_train_step,
)

T2 = 8
rng2 = np.random.RandomState(11)
full_batch = {
    "imu": rng2.randn(GLOBAL_B, T2, 60).astype(np.float32) * 0.1,
    "joints": rng2.randn(GLOBAL_B, T2, 72).astype(np.float32) * 0.1,
    "contacts": (rng2.rand(GLOBAL_B, T2, 2) > 0.5).astype(np.float32),
    "lengths": np.full((GLOBAL_B,), T2, np.int32),
}
gbatch2 = global_batch_from_host_slices(
    {k: v[start:start + size] for k, v in full_batch.items()}, mesh)

state = init_train_state("footcontact", jax.random.PRNGKey(1), lr=1e-3)
state = jax.tree_util.tree_map(np.asarray, state)
rep = NamedSharding(mesh, P())
state = jax.device_put(state,
                       jax.tree_util.tree_map(lambda _: rep, state))
step = make_shard_map_train_step("footcontact", lr=1e-3, mesh=mesh)
p_before = fetch(jax.tree_util.tree_leaves(state.params)[0])
state, loss = step(state, gbatch2, np.asarray(jax.random.PRNGKey(2)))
loss_val = float(fetch(loss))
assert np.isfinite(loss_val), loss_val
p_after = fetch(jax.tree_util.tree_leaves(state.params)[0])
assert not np.array_equal(p_before, p_after), "optimizer did not update"
print(f"TRAIN_LOSS={loss_val:.9e}", flush=True)

print(f"DIST_OK proc={jax.process_index()}", flush=True)
sys.exit(0)
