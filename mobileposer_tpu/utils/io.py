"""Small IO helpers.

Behavioral parity target: reference `articulate/utils/torch/io.py` (txt
matrix load/save) and `utils/file_utils.py` (run-dir numbering lives in
train/trainer.py)."""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np


def load_txt_mat(path, delimiter: str = None) -> np.ndarray:
    """Load a whitespace/CSV matrix text file (reference: io.py:13)."""
    return np.loadtxt(path, delimiter=delimiter, dtype=np.float32)


def save_txt_mat(path, mat, fmt: str = "%.6f", delimiter: str = " ") -> None:
    np.savetxt(path, np.asarray(mat), fmt=fmt, delimiter=delimiter)


def savez_typed(path, flat: dict) -> None:
    """np.savez that round-trips extension dtypes (bfloat16).

    np.savez stores ml_dtypes bfloat16 arrays as raw |V2 void arrays that
    jnp.asarray rejects on reload; bf16 leaves ride as uint16 bit patterns
    plus a '__dtypes__' JSON manifest instead. All npz writers that may
    see bf16 pytrees (checkpoints, combined weights, serving bundles) go
    through here."""
    import json

    import jax.numpy as jnp

    dtypes = {}
    arrays = {}
    for key, val in flat.items():
        val = np.asarray(val)
        dtypes[key] = str(val.dtype)
        if val.dtype == jnp.bfloat16:
            val = val.view(np.uint16)
        arrays[key] = val
    np.savez(path, __dtypes__=json.dumps(dtypes), **arrays)


def loadz_typed(path) -> dict:
    """Inverse of savez_typed; archives written before the manifest
    existed (no '__dtypes__' entry) load as plain np.load dicts."""
    import json

    import jax.numpy as jnp

    # allow_pickle stays False: neither format stores object arrays
    # (strings/ints round-trip as plain arrays), and model-deployment
    # archives must never execute pickle payloads on load
    z = np.load(path)
    if "__dtypes__" not in z.files:
        return {k: z[k] for k in z.files}
    dtypes = json.loads(str(z["__dtypes__"]))
    out = {}
    for key, dt in dtypes.items():
        val = z[key]
        if dt == "bfloat16":
            val = val.view(jnp.bfloat16.dtype)
        out[key] = val
    return out


def get_datestring() -> str:
    """Run-name datestring (reference: utils/file_utils.py)."""
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def make_dir(path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p
