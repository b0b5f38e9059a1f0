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
    num_processes = int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1))
    process_id = int(process_id or os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def host_local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per_host = global_batch_size // n_proc
    return pid * per_host, per_host
