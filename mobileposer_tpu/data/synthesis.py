"""Virtual-IMU synthesis ops — vectorized, jit-compiled, TPU-resident.

Behavioral parity target: `mobileposer/process.py` (the offline dataset
synthesis). The reference builds virtual IMU data with per-frame Python
list comprehensions on CPU (`_syn_acc`, process.py:23-35;
`_foot_ground_probs`, process.py:38-46); here the same math is pure jnp
slicing so whole sequences (and batches of sequences, via vmap) synthesize
on-chip in one fused kernel — this is the "TPU datagen" path of SURVEY §7.6.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R

TARGET_FPS = C.datasets.fps  # 30

# Fixed global-frame alignment AMASS -> DIP (reference: process.py:92).
AMASS_ROT = np.array([[1.0, 0.0, 0.0],
                       [0.0, 0.0, 1.0],
                       [0.0, -1.0, 0.0]])

# IMUPoser global-frame alignment (reference: process.py:320).
IMUPOSER_ROT = np.array([[-1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0],
                          [0.0, 1.0, 0.0]])

VI_MASK = np.asarray(C.VI_MASK)
JI_MASK = np.asarray(C.JI_MASK)


def tracked_vertex_indices(num_vertices: int) -> np.ndarray:
    """The 6 tracked mesh vertices (process.py:18). The official indices
    assume the 6890-vertex SMPL mesh; for smaller fixture bodies they wrap
    deterministically so tests run without the official blob."""
    if num_vertices > int(VI_MASK.max()):
        return VI_MASK
    return VI_MASK % num_vertices


def synthesize_acceleration(vert: jnp.ndarray, smooth_n: int = 4,
                            fps: int = TARGET_FPS) -> jnp.ndarray:
    """Virtual accelerometer from vertex positions (process.py:23-35).

    vert: [T, M, 3] tracked-vertex trajectories. Central 2nd difference
    x fps^2; interior frames use the smoothed wide stencil (stride
    `smooth_n`, scaled 1/smooth_n^2); two frames of zeros at each boundary
    exactly as the reference produces.
    """
    T = vert.shape[0]
    scale = float(fps) ** 2
    zero = jnp.zeros_like(vert[:1])
    acc = (vert[:-2] + vert[2:] - 2 * vert[1:-1]) * scale     # [T-2, M, 3]
    acc = jnp.concatenate([zero, acc, zero])
    mid = smooth_n // 2
    if mid != 0 and T > smooth_n * 2:
        smoothed = (vert[:-2 * smooth_n] + vert[2 * smooth_n:]
                    - 2 * vert[smooth_n:-smooth_n]) * scale / smooth_n ** 2
        acc = acc.at[smooth_n:-smooth_n].set(smoothed)
    return acc


def foot_ground_probs(joint: jnp.ndarray, threshold: float = 0.008) -> jnp.ndarray:
    """Binary foot-ground contact from foot displacement (process.py:38-46).

    joint: [T, 24, 3] -> [T, 2] float {0,1}; frame 0 is no-contact.
    """
    disp_l = jnp.linalg.norm(joint[1:, 10] - joint[:-1, 10], axis=1)
    disp_r = jnp.linalg.norm(joint[1:, 11] - joint[:-1, 11], axis=1)
    contact = jnp.stack([disp_l < threshold, disp_r < threshold], axis=1)
    return jnp.concatenate([jnp.zeros((1, 2), bool), contact]).astype(jnp.float32)


def align_amass_to_dip(pose_aa: jnp.ndarray, tran: jnp.ndarray):
    """Rotate AMASS world frame into the DIP convention (process.py:92-95).

    pose_aa: [T, 24, 3] axis-angle (root in channel 0); tran: [T, 3].
    """
    tran = (AMASS_ROT @ tran[..., None])[..., 0]
    root = R.axis_angle_to_rotation_matrix(pose_aa[:, 0])
    root = R.rotation_matrix_to_axis_angle(AMASS_ROT @ root)
    pose_aa = pose_aa.at[:, 0].set(root)
    return pose_aa, tran


def align_imuposer_to_dip(pose_rot: jnp.ndarray, tran: jnp.ndarray):
    """IMUPoser frame alignment (process.py:320-323).

    pose_rot: [T, 24, 3, 3]; tran: [T, 3].
    """
    pose_rot = pose_rot.at[:, 0].set(IMUPOSER_ROT @ pose_rot[:, 0])
    tran = tran @ IMUPOSER_ROT
    return pose_rot, tran


def synthesize_virtual_imu(body_model, pose_rot: jnp.ndarray,
                           shape: Optional[jnp.ndarray] = None,
                           tran: Optional[jnp.ndarray] = None,
                           smooth_n: int = 4):
    """Full virtual-IMU synthesis for one sequence (process.py:102-121).

    pose_rot: [T, 24, 3, 3] local rotations.
    Returns dict with joint [T,24,3], vacc [T,6,3], vrot [T,6,3,3],
    contact [T,2] — ready for the data pipeline. All math stays on device.
    """
    grot, joint, vert = body_model.forward_kinematics(
        pose_rot, shape=shape, tran=tran, calc_mesh=True)
    vi = tracked_vertex_indices(body_model.num_vertices)
    return {
        "joint": joint,
        "vacc": synthesize_acceleration(vert[:, vi], smooth_n),
        "vrot": grot[:, JI_MASK],
        "contact": foot_ground_probs(joint),
    }


def nan_fill_nearest(x: jnp.ndarray, iters: int = 4) -> jnp.ndarray:
    """Fill NaNs from temporal neighbors (DIP cleanup, process.py:253-258).

    Each iteration copies the previous frame's value into NaN slots, then
    the next frame's value into remaining NaN slots — matching the
    reference's forward/backward masked_scatter loop.
    """
    def body(_, x):
        fwd = jnp.concatenate([x[:1], x[:-1]])
        x = jnp.where(jnp.isnan(x), fwd, x)
        bwd = jnp.concatenate([x[1:], x[-1:]])
        return jnp.where(jnp.isnan(x), bwd, x)

    return jax.lax.fori_loop(0, iters, body, x)


def downsample_step(framerate: float, target_fps: int = TARGET_FPS) -> int:
    """Integer decimation step (process.py:70-72)."""
    return max(1, round(framerate / target_fps))


def remove_acceleration_bias(real_acc: jnp.ndarray,
                             virtual_acc: jnp.ndarray) -> jnp.ndarray:
    """Shift each (imu, axis) channel of the real accelerometer so its mean
    matches the synthetic acceleration (TotalCapture, process.py:207-214)."""
    d = virtual_acc.mean(axis=0) - real_acc.mean(axis=0)
    return real_acc + d
