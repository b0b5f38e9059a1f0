"""Model-level utilities.

Behavioral parity target: reference `mobileposer/utils/model_utils.py`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.models.modules import MODULE_CONFIGS

_REDUCED = np.asarray(C.joint_set.reduced)


def load_model(path) -> dict:
    """Load MobilePoser weights into the params pytree from either our
    combined .npz or a torch checkpoint (reference: model_utils.py:6-15)."""
    path = str(path)
    if path.endswith(".npz"):
        from mobileposer_tpu.nn.torch_convert import load_from_npz
        return load_from_npz(path)
    from mobileposer_tpu.nn.torch_convert import convert_mobileposer_checkpoint
    return convert_mobileposer_checkpoint(path, MODULE_CONFIGS)


def reduced_pose_to_full(reduced_pose: jnp.ndarray) -> jnp.ndarray:
    """[B, S, n_reduced*9] reduced rotmats -> [B, S, 24*9] with identity at
    non-reduced joints (reference: model_utils.py:18-25)."""
    B, S = reduced_pose.shape[0], reduced_pose.shape[1]
    reduced = reduced_pose.reshape(B, S, C.joint_set.n_reduced, 3, 3)
    full = jnp.broadcast_to(jnp.eye(3, dtype=reduced.dtype),
                            (B, S, 24, 3, 3))
    full = full.at[:, :, _REDUCED].set(reduced)
    return full.reshape(B, S, -1)


def smooth_avg(acc: jnp.ndarray, s: int = 3) -> jnp.ndarray:
    """Centered moving average over time that shrinks at the boundaries
    (nanmean-window semantics of reference model_utils.py:28-37).

    acc: [T, ...]; returns same shape.
    """
    T = acc.shape[0]
    half = s // 2
    cum = jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(acc[:1]), acc]), axis=0)          # [T+1, ...]
    idx = jnp.arange(T)
    lo = jnp.clip(idx - half, 0, T)
    hi = jnp.clip(idx + half + 1, 0, T)
    window_sum = cum[hi] - cum[lo]
    count = (hi - lo).reshape((T,) + (1,) * (acc.ndim - 1)).astype(acc.dtype)
    return window_sum / count


def normalize_and_concat(glb_acc: jnp.ndarray, glb_ori: jnp.ndarray) -> jnp.ndarray:
    """6-IMU root-relative normalization (reference: model_utils.py:40-46):
    accel of the 5 body IMUs relative to the root IMU, rotated into the root
    frame; orientations root-relativized. Returns [N, 72]."""
    glb_acc = glb_acc.reshape(-1, 6, 3)
    glb_ori = glb_ori.reshape(-1, 6, 3, 3)
    root_ori = glb_ori[:, 5]                                    # [N, 3, 3]
    acc = jnp.concatenate([glb_acc[:, :5] - glb_acc[:, 5:], glb_acc[:, 5:]], 1)
    acc = (acc @ root_ori) / C.amass.acc_scale                  # [N, 6, 3]
    rel = jnp.swapaxes(root_ori, 1, 2)[:, None] @ glb_ori[:, :5]
    ori = jnp.concatenate([rel, glb_ori[:, 5:]], axis=1)        # [N, 6, 3, 3]
    n = glb_acc.shape[0]
    return jnp.concatenate([acc.reshape(n, -1), ori.reshape(n, -1)], axis=1)
