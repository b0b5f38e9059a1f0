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

def _length_mask(x: jnp.ndarray, lengths,
                 time_major: bool = False) -> Optional[jnp.ndarray]:
    """Validity mask matching x's layout ([B, T, 1] or [T, B, 1]), or None
    when lengths is None. `lengths` is always [B]."""
    if lengths is None:
        return None
    if time_major:
        T = x.shape[0]
        m = jnp.arange(T)[:, None] < lengths[None, :]
    else:
        T = x.shape[1]
        m = jnp.arange(T)[None, :] < lengths[:, None]
    return m.astype(x.dtype)[..., None]


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, lengths=None,
               time_major: bool = False) -> jnp.ndarray:
    """MSE over valid positions (reference: plain nn.MSELoss)."""
    err = (pred - target) ** 2
    m = _length_mask(pred, lengths, time_major)
    if m is None:
        return jnp.mean(err)
    # guard: a fully-padded (sub)batch — e.g. one shard of a shard_map DP
    # step after pad_batch_to_multiple — must yield loss 0, not 0/0 NaN
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[-1], 1.0)


def temporal_smoothness_loss(pred: jnp.ndarray, order: int = 2,
                             lengths=None,
                             time_major: bool = False) -> jnp.ndarray:
    """L1 norm of the `order`-th finite time difference, summed over time,
    averaged over batch (reference: joints.py:71-75 for order=2, the
    "temporal" loss; poser.py:100-103 for order=3, the "jerk" loss)."""
    t_ax = 0 if time_major else 1
    d = jnp.diff(pred, n=order, axis=t_ax)
    l1 = jnp.sum(jnp.abs(d), axis=2)          # [B, T-order] or [T-order, B]
    if lengths is not None:
        T = pred.shape[t_ax]
        idx = jnp.arange(T - order) + order
        valid = (idx[:, None] < lengths[None, :] if time_major
                 else idx[None, :] < lengths[:, None])
        l1 = l1 * valid.astype(l1.dtype)
    return jnp.mean(jnp.sum(l1, axis=t_ax))


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    lengths=None, time_major: bool = False) -> jnp.ndarray:
    """Binary cross-entropy on logits (reference: footcontact.py loss)."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    m = _length_mask(logits, lengths, time_major)
    if m is None:
        return jnp.mean(per)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * per.shape[-1], 1.0)


def multiscale_velocity_loss(pred: jnp.ndarray, target: jnp.ndarray,
                             lengths=None,
                             time_major: bool = False) -> jnp.ndarray:
    """Sum of per-chunk MSEs over chunk sizes n in {1, 3, 9}
    (reference: velocity.py:74-86).

    For chunk size n the reference iterates `range(T // n)` chunks — the
    partial tail chunk is dropped — and each term is nn.MSELoss, i.e. the
    mean over (batch, chunk frames, features). Total = sum over chunks of
    those means, summed over the three scales. Computed here as one
    reshape + segment mean, static-shaped under jit.
    """
    total = 0.0
    if time_major:
        T, B, D = pred.shape
    else:
        B, T, D = pred.shape
    err = (pred - target) ** 2
    m = _length_mask(pred, lengths, time_major)
    if m is not None:
        err = err * m
    for n in (1, 3, 9):
        n_chunks = T // n
        if time_major:
            e = err[:n_chunks * n].reshape(n_chunks, n, B, D)
            sum_axes = (1, 2, 3)
            mm = (None if m is None
                  else m[:n_chunks * n].reshape(n_chunks, n, B, 1))
        else:
            e = err[:, :n_chunks * n].reshape(B, n_chunks, n, D)
            sum_axes = (0, 2, 3)
            mm = (None if m is None
                  else m[:, :n_chunks * n].reshape(B, n_chunks, n, 1))
        if mm is None:
            counts = jnp.full((n_chunks,), B * n * D, err.dtype)
        else:
            counts = mm.sum(axis=sum_axes) * D
        chunk_mean = e.sum(axis=sum_axes) / jnp.maximum(counts, 1.0)
        total = total + jnp.sum(chunk_mean)
    return total


# ---------------------------------------------------------------------------
# Per-module training losses
# ---------------------------------------------------------------------------

T_WEIGHT = 1e-5  # temporal-loss weight (reference: joints.py:33, poser.py:36)

# Every loss takes `time_major`: when True, batch arrays are [T, B, ...]
# (lengths stays [B]) and the module runs time-major end-to-end, skipping
# the [B,T]<->[T,B] transpose round-trip that batch-major chaining pays
# around the LSTM core (the core is time-major internally).


def joints_loss(params, batch, rng, train: bool = True,
                backend: str = "auto_train",
                time_major: bool = False):
    """MSE + 1e-5 * 2nd-diff temporal L1 (reference: joints.py:54-75)."""
    imu, lengths, target_joints = batch["imu"], batch.get("lengths"), batch["joints"]
    drng = jax.random.fold_in(rng, 0)
    pred, _ = module_apply("joints", params, imu, lengths,
                           train=train, dropout_rng=drng, backend=backend,
                           time_major=time_major)
    tgt = target_joints.reshape(pred.shape)
    return (masked_mse(pred, tgt, lengths, time_major)
            + T_WEIGHT * temporal_smoothness_loss(pred, 2, lengths, time_major))


def poser_loss(params, batch, rng, body_model=None, train: bool = True,
               backend: str = "auto_train",
               time_major: bool = False):
    """r6d MSE + 1e-5 * jerk L1 + FK joint-position MSE
    (reference: poser.py:65-98). `body_model` enables the position loss."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_pose = batch["pose_r6d"]          # [B, T, 24, 6] full r6d
    target_joints = batch["joints"]          # [B, T, 72]
    A0, A1 = imu.shape[:2]                   # [T, B] when time_major
    noise = jax.random.normal(jax.random.fold_in(rng, 1),
                              target_joints.shape) * NOISE_STD["poser"]
    noisy = target_joints.reshape(A0, A1, -1) + noise.reshape(A0, A1, -1)
    x = jnp.concatenate([noisy, imu], axis=-1)
    pred, _ = module_apply("poser", params, x, lengths, train=train,
                           dropout_rng=jax.random.fold_in(rng, 2),
                           backend=backend, time_major=time_major)
    tgt = target_pose.reshape(A0, A1, 24, 6)[:, :, jnp.asarray(C.joint_set.reduced)]
    tgt = tgt.reshape(A0, A1, -1)
    loss = masked_mse(pred, tgt, lengths, time_major)
    loss = loss + T_WEIGHT * temporal_smoothness_loss(pred, 3, lengths,
                                                      time_major)
    if body_model is not None:
        # Position loss directly from the predicted GLOBAL rotations: the
        # reference IK's them to local and FK's back (poser.py:94-95).
        # Identical positions (non-reduced joints inherit their nearest
        # reduced ancestor's rotation — exactly what identity-local FK
        # produces), but the whole gather + rotate-bones + tree-add
        # pipeline is one lane-major matmul over a precomputed bone basis
        # (net.joint_positions_from_r6d_soa) — the AoS version cost 16% of
        # the poser train step on v5e.
        from mobileposer_tpu.models.net import joint_positions_from_r6d_soa
        joints_p = joint_positions_from_r6d_soa(pred.reshape(A0 * A1, -1),
                                                body_model)
        joints_p = joints_p.reshape(A0, A1, -1)
        loss = loss + masked_mse(joints_p, target_joints.reshape(A0, A1, -1),
                                 lengths, time_major)
    return loss


def footcontact_loss(params, batch, rng, train: bool = True,
                     backend: str = "auto_train",
                     time_major: bool = False):
    """BCE-with-logits on [L, R] contact (reference: footcontact.py:43-72)."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_joints = batch["joints"].reshape(imu.shape[0], imu.shape[1], -1)
    contacts = batch["contacts"]
    noise = jax.random.normal(jax.random.fold_in(rng, 3),
                              target_joints.shape) * NOISE_STD["footcontact"]
    x = jnp.concatenate([target_joints + noise, imu], axis=-1)
    pred, _ = module_apply("footcontact", params, x, lengths, train=train,
                           backend=backend,
                           dropout_rng=jax.random.fold_in(rng, 4),
                           time_major=time_major)
    return bce_with_logits(pred, contacts.reshape(pred.shape), lengths,
                           time_major)


def velocity_loss(params, batch, rng, train: bool = True,
                  backend: str = "auto_train",
                  time_major: bool = False):
    """Multi-scale chunked MSE (reference: velocity.py:51-86)."""
    imu, lengths = batch["imu"], batch.get("lengths")
    target_joints = batch["joints"].reshape(imu.shape[0], imu.shape[1], -1)
    target_vel = batch["vels"].reshape(imu.shape[0], imu.shape[1], -1)
    noise = jax.random.normal(jax.random.fold_in(rng, 5),
                              target_joints.shape) * NOISE_STD["velocity"]
    x = jnp.concatenate([target_joints + noise, imu], axis=-1)
    pred, _ = module_apply("velocity", params, x, lengths, train=train,
                           backend=backend,
                           dropout_rng=jax.random.fold_in(rng, 6),
                           time_major=time_major)
    return multiscale_velocity_loss(pred, target_vel, lengths, time_major)
