"""Multi-host initialization.

The workload's parallelism is pure data parallelism over the batch
(SURVEY §2.23-2.24: the reference is single-GPU with no distributed
backend). On TPU pods the same jitted train step scales by:

  1. calling `initialize_distributed()` once per host process (DCN
     coordination via jax.distributed),
  2. building the mesh over `jax.devices()` (now spanning all hosts),
  3. feeding each host its local shard of the global batch
     (`host_local_batch_slice`).

XLA places the gradient all-reduce over ICI within a slice and DCN across
slices; nothing else changes relative to single-chip training.

The whole recipe is exercised for real by
`tests/test_distributed.py::test_two_process_cluster_gradients_match_single_process`:
two OS processes form a jax.distributed cluster over localhost (Gloo
collectives between separate runtimes) and the psum-mean gradients over
the global mesh are pinned equal to single-process full-batch gradients.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). No-op (returns False) when running
    single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    # `is not None` (not truthiness): an explicit process_id=0 must beat a
    # stale JAX_PROCESS_ID inherited from the environment
    if num_processes is None:
        num_processes = os.environ.get("JAX_NUM_PROCESSES", 1)
    if process_id is None:
        process_id = os.environ.get("JAX_PROCESS_ID", 0)
    num_processes = int(num_processes)
    process_id = int(process_id)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_local_batch_slice(global_batch_size: int,
                           process_index: Optional[int] = None,
                           process_count: Optional[int] = None
                           ) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch.

    `process_index`/`process_count` default to the live jax.distributed
    topology; passing them explicitly makes the arithmetic unit-testable
    without a multi-host run. The global batch must divide evenly — a
    silent remainder drop would desynchronize the per-host collectives
    (every host must contribute the same shard shape).
    """
    n_proc = jax.process_count() if process_count is None else process_count
    pid = jax.process_index() if process_index is None else process_index
    if n_proc <= 0 or not (0 <= pid < n_proc):
        raise ValueError(f"invalid process topology: index {pid} of {n_proc}")
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch_size} does not divide evenly over "
            f"{n_proc} processes; pad the batch or change the host count")
    per_host = global_batch_size // n_proc
    return pid * per_host, per_host


def global_batch_from_host_slices(batch: dict, mesh, axis_name: str = "data",
                                  batch_dim: int = 0):
    """Assemble per-host batch shards into global `jax.Array`s (step 3 of
    the module recipe). Each process passes only its OWN host-local slice
    (`host_local_batch_slice`); the result's batch dim is the concatenation
    over processes, sharded over `axis_name` of the (multi-host) mesh.

    The spec rule mirrors `parallel.mesh.shard_batch` (1-D arrays such as
    `lengths` shard on their only axis; batch_dim=1 for time-major), so a
    multi-host trainer feeds the SAME jitted train step this helper's
    output where a single-host one feeds `shard_batch`'s. Single-process
    meshes degenerate to exactly `shard_batch` semantics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def leaf(x):
        import numpy as np
        d = 0 if np.ndim(x) <= 1 else batch_dim
        sharding = NamedSharding(mesh, P(*([None] * d), axis_name))
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))
    return {k: leaf(v) for k, v in batch.items()}
