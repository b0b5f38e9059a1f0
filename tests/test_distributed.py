"""Tests for the multi-host helpers (SURVEY 2.24, reference-absent).

Covers the host-slicing arithmetic (pure Python), the single-process
no-op / env wiring of `initialize_distributed`, and — via two spawned OS
processes forming a real jax.distributed cluster over localhost (Gloo
collectives between separate runtimes) — the full multi-host recipe:
initialize -> global mesh -> host-local slices -> global-array assembly
-> psum-mean gradients identical to single-process full-batch.
"""

import numpy as np
import pytest

from mobileposer_tpu.parallel import host_local_batch_slice, initialize_distributed


@pytest.mark.parametrize("n_proc", [1, 2, 3, 4, 8, 16])
@pytest.mark.parametrize("global_batch", [16, 48, 256])
def test_host_slices_partition_the_batch(n_proc, global_batch):
    """Slices across all processes tile the global batch exactly: disjoint,
    ordered, covering."""
    if global_batch % n_proc != 0:
        with pytest.raises(ValueError, match="divide evenly"):
            host_local_batch_slice(global_batch, 0, n_proc)
        return
    covered = np.zeros(global_batch, dtype=int)
    prev_end = 0
    for pid in range(n_proc):
        start, size = host_local_batch_slice(global_batch, pid, n_proc)
        assert size == global_batch // n_proc
        assert start == prev_end                       # ordered + contiguous
        covered[start:start + size] += 1
        prev_end = start + size
    assert prev_end == global_batch
    assert (covered == 1).all()                        # disjoint + covering


def test_host_slice_rejects_bad_topology():
    with pytest.raises(ValueError, match="topology"):
        host_local_batch_slice(8, 2, 2)                # index out of range
    with pytest.raises(ValueError, match="topology"):
        host_local_batch_slice(8, -1, 2)
    with pytest.raises(ValueError, match="topology"):
        host_local_batch_slice(8, 0, 0)
    with pytest.raises(ValueError, match="divide evenly"):
        host_local_batch_slice(10, 0, 4)


def test_host_slice_defaults_to_live_topology():
    """Single-process run: the live jax topology is 1 process, so the slice
    is the whole batch."""
    assert host_local_batch_slice(32) == (0, 32)


def test_initialize_distributed_single_process_noop(monkeypatch):
    """Without a coordinator address (args or env), initialize() must be a
    no-op returning False — single-process training never touches
    jax.distributed."""
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    called = []
    import jax
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert initialize_distributed() is False
    assert called == []


def test_initialize_distributed_env_wiring(monkeypatch):
    """With env vars set, the call forwards coordinator/process identity to
    jax.distributed.initialize verbatim (captured, not actually run)."""
    import jax
    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.update(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    assert initialize_distributed() is True
    assert called == {"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 3}


def test_two_process_cluster_gradients_match_single_process(tmp_path):
    """REAL multi-process leg: two OS processes form a jax.distributed
    cluster (coordinator on localhost, Gloo for cross-process collectives),
    each contributes its host-local batch slice, and the psum-mean LSTM
    gradient over the global mesh equals the single-process full-batch
    gradient (asserted inside each worker — tests/_distributed_worker.py)."""
    import os
    import pathlib
    import socket
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    worker = repo / "tests" / "_distributed_worker.py"

    def run_cluster(attempt):
        # the probe socket closes before the coordinator binds the port —
        # a TOCTOU window another process can win, hence the retry below
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs, logs = [], []
        for pid in range(2):
            env = dict(os.environ,
                       PYTHONPATH=str(repo),
                       JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
            log = open(tmp_path / f"worker{pid}.{attempt}.log", "w+")
            logs.append(log)
            procs.append(subprocess.Popen(
                [sys.executable, str(worker)], cwd=repo, env=env,
                stdout=log, stderr=subprocess.STDOUT))
        try:
            rcs = [p.wait(timeout=420) for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        outs = []
        for log in logs:
            log.seek(0)
            outs.append(log.read())
            log.close()
        return rcs, outs

    for attempt in range(3):
        rcs, outs = run_cluster(attempt)
        if rcs == [0, 0] or not any(
                "Failed to bind" in o or "address already in use" in o.lower()
                for o in outs):
            break  # success, or a real failure (don't mask it by retrying)
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {pid} rc={rc}\n{out[-3000:]}"
        assert f"DIST_OK proc={pid}" in out, out[-3000:]
    # the shard_map train step's psum-mean loss must come out IDENTICAL on
    # both processes (each worker prints its replicated copy)
    losses = [next(line for line in out.splitlines()
                   if line.startswith("TRAIN_LOSS=")) for out in outs]
    assert losses[0] == losses[1], losses


def test_initialize_distributed_explicit_zero_beats_env(monkeypatch):
    """An explicit process_id=0 must win over a stale JAX_PROCESS_ID in the
    environment (0 is falsy — `or` chaining would discard it)."""
    import jax
    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.update(kw))
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    assert initialize_distributed("10.0.0.1:1234", num_processes=2,
                                  process_id=0) is True
    assert called == {"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 2, "process_id": 0}
