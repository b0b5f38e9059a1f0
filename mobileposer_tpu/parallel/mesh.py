"""Device-mesh and sharding helpers.

The reference trains on a single GPU (`devices=[0]`, reference
train.py:68) and has no distributed backend at all (SURVEY §2.23-2.24). The
TPU-native equivalent is GSPMD: declare a mesh once, shard the batch over a
`data` axis, replicate parameters, and let XLA insert the all-reduces over
ICI. Multi-host runs only add `jax.distributed.initialize` — same program.

The helpers keep everything mesh-agnostic: a 1-chip mesh compiles to the
identical program minus collectives, so the same train step serves
single-chip debugging, an 8-device CPU test mesh, and real pods.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; all other dims replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS,
                batch_dim: int = 0):
    """Place a host batch dict onto the mesh, batch-dim sharded.

    batch_dim=1 handles time-major batches ([T, B, ...]); 1-D arrays
    (per-sequence `lengths`) are always sharded on their only axis."""
    def sharding_of(x):
        d = 0 if np.ndim(x) <= 1 else batch_dim
        return NamedSharding(mesh, P(*([None] * d), axis_name))
    # ONE device_put call for the whole dict: transfers are issued together
    # instead of one blocking round per leaf (a measured ~0.2 s/batch of
    # the training epoch on the tunneled device)
    return jax.device_put(batch, jax.tree_util.tree_map(sharding_of, batch))


def replicate_params(params, mesh: Mesh):
    # one device_put call for the whole tree (per-leaf puts pay a
    # transport round per leaf on tunneled devices)
    rep = replicated(mesh)
    return jax.device_put(
        params, jax.tree_util.tree_map(lambda _: rep, params))


def shard_stream_state(state, n_streams: int, mesh: Mesh,
                       axis_name: str = DATA_AXIS, stream_axes=None):
    """Place a batched streaming-state pytree onto the mesh with the STREAM
    axis sharded (serving fleets: params replicated, slots spread over
    devices — the layout the driver dryrun and `PoseServer(mesh=...)` use).

    The stream axis per leaf comes from `stream_axes` (a matching pytree
    of ints), or from the state class's `STREAM_AXES` attribute
    (`MobilePoserNet.OnlineState` / `models.streaming.CarryState` declare
    theirs) — exact, never inferred. For unknown pytrees without either,
    a shape heuristic matches leaves by `n_streams` (leading axis first);
    that guess is ambiguous when n_streams collides with another dimension
    (layer stacks, ring length), so named states declare their axes."""
    if stream_axes is None:
        stream_axes = getattr(type(state), "STREAM_AXES", None)

    def spec_for_axis(x, ax):
        if np.ndim(x) == 0:
            return NamedSharding(mesh, P())
        if np.shape(x)[ax] != n_streams:
            # loud, not silently wrong: an UNBATCHED state shares the class
            # (and therefore STREAM_AXES) with its batched variant — its
            # declared axis indexes a window/layer dimension instead
            raise ValueError(
                f"declared stream axis {ax} of a leaf with shape "
                f"{np.shape(x)} does not have size n_streams={n_streams}; "
                "is this state batched (init_*_state_batched)?")
        return NamedSharding(mesh, P(*([None] * ax), axis_name))

    if stream_axes is not None:
        shardings = jax.tree_util.tree_map(spec_for_axis, state,
                                           stream_axes)
    else:
        def spec_of(x):
            shape = np.shape(x)
            if len(shape) >= 1 and shape[0] == n_streams:
                return NamedSharding(mesh, P(axis_name))
            if len(shape) >= 2 and shape[1] == n_streams:
                return NamedSharding(mesh, P(None, axis_name))
            return NamedSharding(mesh, P())
        shardings = jax.tree_util.tree_map(spec_of, state)
    # one device_put for the whole pytree (transfer-batching rule)
    return jax.device_put(state, shardings)


def pad_batch_to_multiple(batch: dict, multiple: int,
                          batch_dim: int = 0) -> dict:
    """Pad the batch dim so it divides the mesh; padded rows get length 0 so
    masked losses ignore them. batch_dim=1 for time-major batches; 1-D
    arrays (`lengths`) always pad on their only axis."""
    probe = next(v for v in batch.values() if np.ndim(v) > 1)
    b = probe.shape[batch_dim]
    pad = (-b) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        d = 0 if v.ndim <= 1 else batch_dim
        widths = [(0, 0)] * v.ndim
        widths[d] = (0, pad)
        out[k] = np.pad(v, widths)
    return out
