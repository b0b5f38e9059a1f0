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


def get_datestring() -> str:
    """Run-name datestring (reference: utils/file_utils.py)."""
    return datetime.datetime.now().strftime("%Y%m%d-%H%M%S")


def make_dir(path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p
