"""The four MobilePoser estimation modules as pure functions.

Behavioral parity targets (architecture + losses, re-designed functionally
for jit/vmap/pjit):
  - Joints      (reference: mobileposer/models/joints.py:13-114)
  - Poser       (reference: mobileposer/models/poser.py:14-148)
  - FootContact (reference: mobileposer/models/footcontact.py:13-100)
  - Velocity    (reference: mobileposer/models/velocity.py:14-121)

Each module is an RNN block (nn/lstm.py) plus a loss. Parameters are plain
pytrees; static shapes come from the configs below (parity with the
reference's layer sizes: joints.py:29, poser.py:32, footcontact.py:28,
velocity.py:29).

Unlike the reference — whose MSE silently includes zero-padded positions of
ragged windows — losses here take an optional `lengths` and mask padding
out. For full-length windows (the common case: fixed 125-frame training
windows) the two are identical.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.nn.lstm import LSTMConfig, init_rnn, rnn_apply

N_IMU = C.model_config.n_imu                     # 60
N_JOINTS_OUT = C.model_config.n_output_joints    # 24
N_REDUCED = C.joint_set.n_reduced                # 16

MODULE_CONFIGS: Dict[str, LSTMConfig] = {
    # IMU(60) -> 24x3 joint positions
    "joints": LSTMConfig(N_IMU, N_JOINTS_OUT * 3, 256),
    # [joints(72) | IMU(60)] -> 16 reduced joints x r6d
    "poser": LSTMConfig(N_JOINTS_OUT * 3 + N_IMU, N_REDUCED * 6, 256),
    # [joints | IMU](132) -> 2 foot-contact logits
    "footcontact": LSTMConfig(N_JOINTS_OUT * 3 + N_IMU, 2, 64),
    # [joints | IMU](132) -> 24x3 per-joint velocity; streaming (uni) LSTM
    "velocity": LSTMConfig(N_JOINTS_OUT * 3 + N_IMU, N_JOINTS_OUT * 3, 256,
                           bidirectional=False),
}

# Gaussian-noise std used for joint-input augmentation during training
# (reference: poser.py:80, footcontact.py:57 use 0.04; velocity.py:64 0.025).
NOISE_STD = {"poser": 0.04, "footcontact": 0.04, "velocity": 0.025}


def init_all_modules(key: jax.Array, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, len(MODULE_CONFIGS))
    return {name: init_rnn(k, cfg, dtype)
            for k, (name, cfg) in zip(keys, MODULE_CONFIGS.items())}


def module_apply(name: str, params: dict, x: jnp.ndarray,
                 lengths=None, h0c0=None, train: bool = False,
                 dropout_rng=None, backend: str = "xla",
                 time_major: bool = False):
    """Run one module's RNN block. Returns (y, (h_T, c_T))."""
    return rnn_apply(params, MODULE_CONFIGS[name], x, lengths, h0c0,
                     train=train, dropout_rng=dropout_rng, backend=backend,
                     time_major=time_major)


# ---------------------------------------------------------------------------
# Loss helpers
# ---------------------------------------------------------------------------

def _length_mask(x: jnp.ndarray, lengths) -> Optional[jnp.ndarray]:
    """[B, T, 1] validity mask, or None when lengths is None."""
    if lengths is None:
        return None
    T = x.shape[1]
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)[..., None]


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, lengths=None) -> jnp.ndarray:
    """MSE over valid positions (reference: plain nn.MSELoss)."""
    err = (pred - target) ** 2
    m = _length_mask(pred, lengths)
    if m is None:
        return jnp.mean(err)
    return jnp.sum(err * m) / (jnp.sum(m) * err.shape[-1])


def temporal_smoothness_loss(pred: jnp.ndarray, order: int = 2,
                             lengths=None) -> jnp.ndarray:
    """L1 norm of the `order`-th finite time difference, summed over time,
    averaged over batch (reference: joints.py:71-75 for order=2, the
    "temporal" loss; poser.py:100-103 for order=3, the "jerk" loss)."""
    d = pred
    for _ in range(order):
        d = d[:, 1:] - d[:, :-1]
    l1 = jnp.sum(jnp.abs(d), axis=2)                  # [B, T-order]
    if lengths is not None:
        T = pred.shape[1]
        valid = (jnp.arange(T - order)[None, :] + order < lengths[:, None])
        l1 = l1 * valid.astype(l1.dtype)
    return jnp.mean(jnp.sum(l1, axis=1))


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    lengths=None) -> jnp.ndarray:
    """Binary cross-entropy on logits (reference: footcontact.py loss)."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    m = _length_mask(logits, lengths)
    if m is None:
        return jnp.mean(per)
    return jnp.sum(per * m) / (jnp.sum(m) * per.shape[-1])


def multiscale_velocity_loss(pred: jnp.ndarray, target: jnp.ndarray,
                             lengths=None) -> jnp.ndarray:
    """Sum of per-chunk MSEs over chunk sizes n in {1, 3, 9}
    (reference: velocity.py:74-86).

    For chunk size n the reference iterates `range(T // n)` chunks — the
    partial tail chunk is dropped — and each term is nn.MSELoss, i.e. the
    mean over (batch, chunk frames, features). Total = sum over chunks of
    those means, summed over the three scales. Computed here as one
    reshape + segment mean, static-shaped under jit.
    """
    total = 0.0
    B, T, D = pred.shape
    err = (pred - target) ** 2
    m = _length_mask(pred, lengths)
    if m is not None:
        err = err * m
    for n in (1, 3, 9):
        n_chunks = T // n
        e = err[:, :n_chunks * n].reshape(B, n_chunks, n, D)
        if m is None:
            counts = jnp.full((n_chunks,), B * n * D, err.dtype)
        else:
            mm = m[:, :n_chunks * n].reshape(B, n_chunks, n, 1)
            counts = mm.sum(axis=(0, 2, 3)) * D
        chunk_mean = e.sum(axis=(0, 2, 3)) / jnp.maximum(counts, 1.0)
        total = total + jnp.sum(chunk_mean)
    return total


# ---------------------------------------------------------------------------
# Per-module training losses
# ---------------------------------------------------------------------------

T_WEIGHT = 1e-5  # temporal-loss weight (reference: joints.py:33, poser.py:36)


def joints_loss(params, batch, rng, train: bool = True):
    """MSE + 1e-5 * 2nd-diff temporal L1 (reference: joints.py:54-75)."""
    imu, lengths, target_joints = batch["imu"], batch.get("lengths"), batch["joints"]
    drng = jax.random.fold_in(rng, 0)
    pred, _ = module_apply("joints", params, imu, lengths,
                           train=train, dropout_rng=drng)
    tgt = target_joints.reshape(pred.shape)
    return masked_mse(pred, tgt, lengths) + T_WEIGHT * temporal_smoothness_loss(
        pred, 2, lengths)


def poser_loss(params, batch, rng, body_model=None, train: bool = True):
    """r6d MSE + 1e-5 * jerk L1 + FK joint-position MSE
    (reference: poser.py:65-98). `body_model` enables the position loss."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_pose = batch["pose_r6d"]          # [B, T, 24, 6] full r6d
    target_joints = batch["joints"]          # [B, T, 72]
    B, T = imu.shape[:2]
    noise = jax.random.normal(jax.random.fold_in(rng, 1),
                              target_joints.shape) * NOISE_STD["poser"]
    noisy = target_joints.reshape(B, T, -1) + noise.reshape(B, T, -1)
    x = jnp.concatenate([noisy, imu], axis=-1)
    pred, _ = module_apply("poser", params, x, lengths, train=train,
                           dropout_rng=jax.random.fold_in(rng, 2))
    tgt = target_pose.reshape(B, T, 24, 6)[:, :, jnp.asarray(C.joint_set.reduced)]
    tgt = tgt.reshape(B, T, -1)
    loss = masked_mse(pred, tgt, lengths)
    loss = loss + T_WEIGHT * temporal_smoothness_loss(pred, 3, lengths)
    if body_model is not None:
        # Position loss directly from the predicted GLOBAL rotations: the
        # reference IK's them to local and FK's back (poser.py:94-95). With
        # effective=True (non-reduced joints inherit their nearest reduced
        # ancestor's global rotation — exactly what identity-local FK
        # produces) the positions are identical, but this path is one
        # parallel matvec + level-parallel adds instead of the IK + 3x3
        # matmul chain, which was 4.3x the rest of the step on v5e.
        from mobileposer_tpu.models.net import reduced_r6d_to_global
        global_rot = reduced_r6d_to_global(pred.reshape(B * T, -1),
                                           effective=True)
        joints_p = body_model.joint_positions_from_global(global_rot)
        joints_p = joints_p.reshape(B, T, -1)
        loss = loss + masked_mse(joints_p, target_joints.reshape(B, T, -1), lengths)
    return loss


def footcontact_loss(params, batch, rng, train: bool = True):
    """BCE-with-logits on [L, R] contact (reference: footcontact.py:43-72)."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_joints = batch["joints"].reshape(imu.shape[0], imu.shape[1], -1)
    contacts = batch["contacts"]
    noise = jax.random.normal(jax.random.fold_in(rng, 3),
                              target_joints.shape) * NOISE_STD["footcontact"]
    x = jnp.concatenate([target_joints + noise, imu], axis=-1)
    pred, _ = module_apply("footcontact", params, x, lengths, train=train,
                           dropout_rng=jax.random.fold_in(rng, 4))
    return bce_with_logits(pred, contacts.reshape(pred.shape), lengths)


def velocity_loss(params, batch, rng, train: bool = True):
    """Multi-scale chunked MSE (reference: velocity.py:51-86)."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_joints = batch["joints"].reshape(imu.shape[0], imu.shape[1], -1)
    target_vel = batch["vels"].reshape(imu.shape[0], imu.shape[1], -1)
    noise = jax.random.normal(jax.random.fold_in(rng, 5),
                              target_joints.shape) * NOISE_STD["velocity"]
    x = jnp.concatenate([target_joints + noise, imu], axis=-1)
    pred, _ = module_apply("velocity", params, x, lengths, train=train,
                           dropout_rng=jax.random.fold_in(rng, 6))
    return multiscale_velocity_loss(pred, target_vel, lengths)
