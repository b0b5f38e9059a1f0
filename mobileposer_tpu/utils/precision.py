"""Precision control helpers.

JAX's default matmul precision on TPU (and its CPU emulation) is bfloat16,
which costs ~1e-3 relative error — fine for LSTM layers, fatal for rotation
math that must hold sub-0.1-degree parity. Kinematics entry points are
wrapped with `f32_matmuls` so their (tiny 3x3) contractions always run at
float32 precision; neural-network matmuls are left at the fast default.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Run all matmuls/einsums traced inside `fn` at float32 precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
