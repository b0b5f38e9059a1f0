"""Deterministic synthetic dataset fixtures.

The reference's large blobs (SMPL pickle, AMASS/DIP datasets) are not
shipped (`.MISSING_LARGE_BLOBS`), so tests, benchmarks and the training
smoke path run on synthetic motions: smooth random pose trajectories pushed
through the *real* virtual-IMU synthesis pipeline (data/synthesis.py) over
the synthetic SMPL fixture. The output uses exactly the processed-dataset
schema of the reference (`process.py:113-121`), so the entire downstream
stack exercises the same code paths as with real data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mobileposer_tpu.data.synthesis import synthesize_virtual_imu
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics.smpl import ParametricModel


def smooth_random_pose(rng: np.random.Generator, T: int,
                       step_std: float = 0.02) -> np.ndarray:
    """[T, 24, 3, 3] local rotations from integrated small random twists."""
    import jax
    increments = rng.normal(0.0, step_std, (T, 24, 3)).astype(np.float32)
    aa = np.cumsum(increments, axis=0)
    rot = jax.jit(R.axis_angle_to_rotation_matrix)(jnp.asarray(aa.reshape(-1, 3)))
    return np.asarray(rot).reshape(T, 24, 3, 3)


def _synth_jit(body_model):
    """One jitted synthesis program per body, cached on the instance
    (avoids eager per-op dispatch, which is pathologically slow on tunneled
    devices, without retaining bodies in a module-global cache)."""
    fn = getattr(body_model, "_synth_jit", None)
    if fn is None:
        import jax
        fn = jax.jit(lambda pose, tran: synthesize_virtual_imu(
            body_model, pose, tran=tran))
        body_model._synth_jit = fn
    return fn


def synthetic_sequence(body_model: ParametricModel, rng: np.random.Generator,
                       T: int = 200) -> dict:
    """One synthetic processed sequence in the reference .pt schema."""
    pose = smooth_random_pose(rng, T)
    tran = np.cumsum(rng.normal(0, 0.01, (T, 3)), axis=0).astype(np.float32)
    syn = _synth_jit(body_model)(jnp.asarray(pose), jnp.asarray(tran))
    return {
        "pose": pose,
        "tran": tran,
        "joint": np.asarray(syn["joint"]),
        "acc": np.asarray(syn["vacc"]),
        "ori": np.asarray(syn["vrot"]),
        "contact": np.asarray(syn["contact"]),
    }


def make_synthetic_processed_dataset(
        path, n_sequences: int = 3, T: int = 200, seed: int = 0,
        body_model: Optional[ParametricModel] = None) -> Path:
    """Write a synthetic processed dataset file (.pt via torch, or .npz)."""
    body_model = body_model or ParametricModel.synthetic(num_vertices=240)
    rng = np.random.default_rng(seed)
    seqs = [synthetic_sequence(body_model, rng, T) for _ in range(n_sequences)]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix == ".npz":
        np.savez(path, sequences=np.asarray(seqs, dtype=object))
        return path
    import torch
    data = {key: [torch.from_numpy(np.array(s[key])) for s in seqs]
            for key in ("pose", "tran", "joint", "acc", "ori", "contact")}
    torch.save(data, path)
    return path
