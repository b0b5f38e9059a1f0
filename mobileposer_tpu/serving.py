"""AOT-compiled serving bundles (jax.export / StableHLO).

Serializes the batched streaming step — exact windowed semantics or carry
mode — or the stateless batched OFFLINE forward as a platform-tagged
StableHLO artifact alongside the weights (and, for streaming modes, a
fresh streaming state), so a serving host can run the model without tracing
or re-deriving the model math, and so a program exported today keeps
running across framework upgrades (StableHLO artifacts are
forward-compatible; a re-trace is not guaranteed to be).

The reference has no deployment story: serving means running the torch
modules in-process (reference live_demo.py). Here:

    # build box
    save_bundle("bundle/", net, params, n_streams=256, mode="carry")

    # serving host (needs jax + this package for the state pytree classes,
    # but never traces or compiles the model code)
    step, params, state, meta = load_bundle("bundle/")
    (pose, joints, root, contact), state = step(params, state, frames)

Bundles are exported for the 'tpu' platform only by default: each extra
lowering target roughly doubles export time (~3 min per platform for the
256-stream exact step on the 1-core build host) and buys nothing on the
serving chip. Pass platforms=("tpu", "cpu") (or --platforms tpu,cpu) when
the same artifact must also run local CPU smoke tests.

What AOT does and does not buy (measured r3, v5e-1): the artifact stores
StableHLO, so the serving host never TRACES model code (no python model
deps beyond the state pytree classes, stable across framework upgrades),
but the backend still compiles the module at first call — XLA cannot
deserialize a compiled TPU executable from a portable artifact, only the
persistent compile cache (keyed to an exact chip+version) skips that, and
jax.export artifacts deliberately sit above it. First-step latency is
therefore comparable to a jit first-call with a warm persistent compile
cache (3.4 s vs 2.7 s measured). Deploy-time wins are hermeticity and
version stability, not cold-start.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jx

from mobileposer_tpu.models.net import MobilePoserNet
from mobileposer_tpu.models.streaming import BiCarry, CarryState, JointsCarry
from mobileposer_tpu.nn.torch_convert import export_to_npz, load_from_npz
from mobileposer_tpu.utils.io import loadz_typed, savez_typed

_STEP_FILE = "step.jaxexport"
_WEIGHTS_FILE = "weights.npz"
_STATE_FILE = "state.npz"
_META_FILE = "meta.json"

_registered = False


def _register_state_serialization() -> None:
    """Register the streaming-state NamedTuples with jax.export so the
    exported call signature round-trips. Idempotent."""
    global _registered
    if _registered:
        return
    for cls, name in ((MobilePoserNet.OnlineState,
                       "mobileposer_tpu.OnlineState"),
                      (CarryState, "mobileposer_tpu.CarryState"),
                      (JointsCarry, "mobileposer_tpu.JointsCarry"),
                      (BiCarry, "mobileposer_tpu.BiCarry")):
        jx.register_namedtuple_serialization(cls, serialized_name=name)
    _registered = True


def _spec(tree):
    # read shape/dtype host-side: jnp.asarray here would transfer every
    # weight leaf to the device just to inspect it (~30 ms RTT each on
    # tunneled transports — CLAUDE.md)
    def leaf_spec(x):
        dtype = getattr(x, "dtype", None) or np.asarray(x).dtype
        return jax.ShapeDtypeStruct(np.shape(x), jnp.dtype(dtype))
    return jax.tree_util.tree_map(leaf_spec, tree)


def _fresh_state(net: MobilePoserNet, n_streams: int, mode: str, dtype):
    if mode == "carry":
        return net.init_carry_state_batched(n_streams, dtype=dtype)
    if mode == "exact":
        return net.init_online_state_batched(n_streams, dtype=dtype)
    raise ValueError(f"mode must be 'carry' or 'exact', got {mode!r}")


def export_offline_forward(net: MobilePoserNet, params: dict,
                           batch_size: int, seq_len: int,
                           dtype=jnp.float32,
                           platforms: Tuple[str, ...] = ("tpu",)
                           ) -> "jx.Exported":
    """AOT-export the batched OFFLINE forward for batch-processing
    deployments (whole padded sequences in, pose/joints/tran/contact out;
    stateless). Signature: (params, imu [B, T, 60], lengths [B]) ->
    (pose, joints, tran, contact) — the same program dataset evaluation
    runs (evaluation/pose_eval.forward_offline_batched)."""
    from mobileposer_tpu.evaluation.pose_eval import forward_offline_batched

    def fn(params, imu, lengths):
        return forward_offline_batched(net, params, imu, lengths)

    imu = jax.ShapeDtypeStruct((batch_size, seq_len, 60), jnp.dtype(dtype))
    lengths = jax.ShapeDtypeStruct((batch_size,), jnp.dtype(jnp.int32))
    return jx.export(jax.jit(fn), platforms=list(platforms))(
        _spec(params), imu, lengths)


def export_streaming_step(net: MobilePoserNet, params: dict, n_streams: int,
                          mode: str = "carry", dtype=jnp.float32,
                          platforms: Tuple[str, ...] = ("tpu",),
                          state=None) -> "jx.Exported":
    """AOT-export one batched streaming step.

    The exported function has the same signature as the live one:
    (params, state, frames [S, 60]) -> ((pose, joints, root, contact),
    new_state). Body-model constants are baked into the artifact.
    """
    _register_state_serialization()
    if state is None:
        state = _fresh_state(net, n_streams, mode, dtype)
    step = (net.forward_carry_batched if mode == "carry"
            else net.forward_online_batched)
    frames = jax.ShapeDtypeStruct((n_streams, 60), jnp.dtype(dtype))
    return jx.export(jax.jit(step), platforms=list(platforms))(
        _spec(params), _spec(state), frames)


def _save_state_npz(path, state) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    savez_typed(path, {f"leaf_{i}": np.asarray(l)
                        for i, l in enumerate(leaves)})


def _state_treedef(mode: str):
    """Tree structure of a fresh streaming state, from placeholder leaves
    (no body model needed at load time)."""
    if mode == "carry":
        template = CarryState(0, 0, JointsCarry(0, 0, 0, 0, 0, 0),
                              BiCarry(0, 0, 0, 0), BiCarry(0, 0, 0, 0),
                              0, 0, 0, 0, 0, 0)
    else:
        template = MobilePoserNet.OnlineState(0, 0, 0, 0, 0, 0, 0, 0)
    return jax.tree_util.tree_structure(template)


def _load_state_npz(path, mode: str):
    flat = loadz_typed(path)
    leaves = [flat[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree_util.tree_unflatten(_state_treedef(mode), leaves)


def save_bundle(directory, net: MobilePoserNet, params: dict,
                n_streams: int, mode: str = "carry", dtype=jnp.float32,
                platforms: Tuple[str, ...] = ("tpu",),
                seq_len: int = 512, quantize: str | None = None) -> Path:
    """Write a self-contained serving bundle: StableHLO step + weights +
    fresh state + metadata.

    mode='carry'/'exact' exports the batched STREAMING step (n_streams
    concurrent streams, carried state). mode='offline' exports the
    stateless batched offline forward over [n_streams, seq_len, 60]
    padded sequences (batch-processing deployments; no state file).

    quantize='int8' bakes the W8A8 program (ops/quant.py) into the
    artifact: int8 kernels ship in the weights npz (4x smaller than f32)
    and the exported StableHLO contains the int8 matmuls — the deployment
    host needs no quantization code. In carry mode the program is pure
    XLA; exact/offline programs embed the int8 Pallas window kernels
    (single-device TPU artifacts)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize {quantize!r}")
    if quantize == "int8":
        from mobileposer_tpu.ops.quant import quantize_params_int8
        params = quantize_params_int8(params)
    if mode == "offline":
        exported = export_offline_forward(net, params, n_streams, seq_len,
                                          dtype, platforms)
        state = None
    else:
        state = _fresh_state(net, n_streams, mode, dtype)
        exported = export_streaming_step(net, params, n_streams, mode,
                                         dtype, platforms, state=state)
    (directory / _STEP_FILE).write_bytes(exported.serialize())
    export_to_npz(params, directory / _WEIGHTS_FILE)
    if state is not None:
        _save_state_npz(directory / _STATE_FILE, state)
    (directory / _META_FILE).write_text(json.dumps({
        "mode": mode,
        "n_streams": n_streams,
        **({"seq_len": seq_len} if mode == "offline" else {}),
        "dtype": str(jnp.dtype(dtype)),
        **({"quantize": quantize} if quantize else {}),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "format": "jax.export StableHLO v2 (typed npz)",
    }, indent=2))
    return directory


def load_bundle(directory):
    """Load a serving bundle. Returns (step, params, fresh_state, meta);
    `step(params, state, frames)` executes the AOT artifact (no tracing of
    model code; jax dispatches the deserialized StableHLO directly).
    Offline bundles return state=None and
    `step(params, imu, lengths) -> (pose, joints, tran, contact)`."""
    _register_state_serialization()
    directory = Path(directory)
    meta = json.loads((directory / _META_FILE).read_text())
    exported = jx.deserialize((directory / _STEP_FILE).read_bytes())
    params = load_from_npz(directory / _WEIGHTS_FILE)
    if meta["mode"] == "offline":
        def step(params, imu, lengths):
            return exported.call(params, imu, lengths)
        return step, params, None, meta
    state = _load_state_npz(directory / _STATE_FILE, meta["mode"])

    def step(params, state, frames):
        return exported.call(params, state, frames)

    return step, params, state, meta
