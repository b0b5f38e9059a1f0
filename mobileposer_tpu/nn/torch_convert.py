"""Convert released PyTorch MobilePoser checkpoints to our jax pytrees.

The reference ships weights either as per-module Lightning checkpoints or as
one combined `state_dict` saved by `combine_weights.py:41-56`, with submodule
prefixes `joints.joints`, `pose.pose`, `foot_contact.footcontact`,
`velocity.vel` (attribute names from `net.py:41-44`, `joints.py:29`,
`poser.py:32`, `footcontact.py:28`, `velocity.py:29`). Torch LSTM weights are
`weight_ih_l{k}[_reverse]` of shape [4H, in] with gate order (i, f, g, o) —
the same gate order we use, so conversion is a pure transpose.

Torch is used host-side only, to deserialize the pickle.
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping

import numpy as np

from mobileposer_tpu.nn.lstm import LSTMConfig

# (our module name) -> state_dict prefix inside the combined checkpoint
COMBINED_PREFIXES: Dict[str, str] = {
    "joints": "joints.joints",
    "poser": "pose.pose",
    "footcontact": "foot_contact.footcontact",
    "velocity": "velocity.vel",
}


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)  # torch tensor


def convert_rnn_state_dict(sd: Mapping[str, "object"], prefix: str,
                           cfg: LSTMConfig) -> dict:
    """Extract one RNN block (linear1/rnn/linear2) from a torch state_dict."""
    g = lambda name: _np(sd[f"{prefix}.{name}"])
    params = {
        "linear1": {"w": g("linear1.weight").T, "b": g("linear1.bias")},
        "linear2": {"w": g("linear2.weight").T, "b": g("linear2.bias")},
        "lstm": [],
    }
    for layer in range(cfg.n_layers):
        dirs = {}
        for dname, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if dname == "bwd" and not cfg.bidirectional:
                continue
            dirs[dname] = {
                "w_ih": g(f"rnn.weight_ih_l{layer}{suffix}").T,
                "w_hh": g(f"rnn.weight_hh_l{layer}{suffix}").T,
                "b_ih": g(f"rnn.bias_ih_l{layer}{suffix}"),
                "b_hh": g(f"rnn.bias_hh_l{layer}{suffix}"),
            }
        params["lstm"].append(dirs)
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Host-side torch.load of a raw state_dict or Lightning checkpoint
    (reference behavior: utils/model_utils.py:6-15)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _np(v) for k, v in obj.items() if hasattr(v, "detach") or
            isinstance(v, np.ndarray)}


def convert_mobileposer_checkpoint(sd_or_path, configs: Mapping[str, LSTMConfig]) -> dict:
    """Combined checkpoint -> {"joints": ..., "poser": ..., ...} pytree.

    `configs` maps our module names to their LSTMConfig (see
    models/modules.py). Accepts a path or an already-loaded state_dict.
    """
    sd = (load_torch_state_dict(sd_or_path)
          if isinstance(sd_or_path, (str, bytes)) or hasattr(sd_or_path, "__fspath__")
          else sd_or_path)
    return {name: convert_rnn_state_dict(sd, COMBINED_PREFIXES[name], configs[name])
            for name in configs}


def export_rnn_state_dict(params: dict, prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of convert_rnn_state_dict: one RNN block back to torch
    state_dict keys (numpy values; transpose-only, exact)."""
    sd = {
        f"{prefix}.linear1.weight": np.asarray(params["linear1"]["w"],
                                               np.float32).T.copy(),
        f"{prefix}.linear1.bias": np.asarray(params["linear1"]["b"],
                                             np.float32).copy(),
        f"{prefix}.linear2.weight": np.asarray(params["linear2"]["w"],
                                               np.float32).T.copy(),
        f"{prefix}.linear2.bias": np.asarray(params["linear2"]["b"],
                                             np.float32).copy(),
    }
    for layer, dirs in enumerate(params["lstm"]):
        for dname, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if dname not in dirs:
                continue
            d = dirs[dname]
            sd[f"{prefix}.rnn.weight_ih_l{layer}{suffix}"] = \
                np.asarray(d["w_ih"], np.float32).T.copy()
            sd[f"{prefix}.rnn.weight_hh_l{layer}{suffix}"] = \
                np.asarray(d["w_hh"], np.float32).T.copy()
            sd[f"{prefix}.rnn.bias_ih_l{layer}{suffix}"] = \
                np.asarray(d["b_ih"], np.float32).copy()
            sd[f"{prefix}.rnn.bias_hh_l{layer}{suffix}"] = \
                np.asarray(d["b_hh"], np.float32).copy()
    return sd


def export_to_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Our trained params pytree -> the reference's COMBINED state_dict
    layout (reference combine_weights.py:41-56 prefixes), so parity day can
    also run the other direction: load a checkpoint trained HERE into the
    reference implementation and evaluate it with the reference's own
    evaluate.py. Exact inverse of convert_mobileposer_checkpoint
    (roundtrip pinned in tests/test_lstm.py)."""
    sd: Dict[str, np.ndarray] = {}
    for name, prefix in COMBINED_PREFIXES.items():
        if name in params:
            sd.update(export_rnn_state_dict(params[name], prefix))
    return sd


def save_torch_checkpoint(params: dict, path: str) -> None:
    """torch.save the reference-format combined state_dict (torch tensors,
    loadable by the reference's load_model — utils/model_utils.py:6-15)."""
    import torch
    sd = {k: torch.from_numpy(v) for k, v in
          export_to_torch_state_dict(params).items()}
    torch.save(sd, path)


@functools.lru_cache(maxsize=None)
def _cast_program(dtype_str: str):
    import jax
    import jax.numpy as jnp
    dtype = jnp.dtype(dtype_str)

    _QUANT_SCALE_KEYS = ("w_ih_scale", "w_hh_scale")

    def cast(path, x):
        if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return x  # int8 kernels survive the cast (ops/quant.py)
        # int8 dequant scales stay f32: a bf16 scale would add ~0.4%
        # multiplicative dequant error on top of the int8 noise itself
        if any(getattr(k, "key", None) in _QUANT_SCALE_KEYS for k in path):
            return x
        return x.astype(dtype)

    return jax.jit(lambda t: jax.tree_util.tree_map_with_path(cast, t))


def cast_params(params, dtype):
    """Cast every float leaf of a params pytree (e.g. to bfloat16 for
    inference — the MXU runs bf16 at 2x fp32 and halves HBM traffic; keep
    fp32 for training and strict-parity evaluation).

    The whole tree casts inside ONE jitted program, cached per target
    dtype (per-leaf eager casts dispatch — and on tunneled devices
    remote-compile — once per leaf; an un-cached jit would re-trace per
    call)."""
    import jax.numpy as jnp
    return _cast_program(str(jnp.dtype(dtype)))(params)


def export_to_npz(params: dict, path: str) -> None:
    """Flatten a converted params pytree into an .npz (torch-free reload).

    Extension dtypes (bfloat16) survive via utils.io.savez_typed — plain
    np.savez would degrade them to raw void arrays on reload."""
    from mobileposer_tpu.utils.io import savez_typed

    flat = {}

    def walk(node, key):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{key}/{k}" if key else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{key}/{i}")
        else:
            flat[key] = np.asarray(node)

    walk(params, "")
    savez_typed(path, flat)


def load_from_npz(path: str) -> dict:
    """Inverse of export_to_npz (list indices are restored as lists);
    reads both manifest-typed and legacy plain archives."""
    from mobileposer_tpu.utils.io import loadz_typed

    flat = loadz_typed(path)
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)
