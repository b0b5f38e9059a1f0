"""Full-motion metric suite, TPU-native.

Behavioral parity target: reference `mobileposer/articulate/evaluator.py`
(`FullMotionEvaluator`, evaluator.py:269-343) and the binary-classification
evaluators (evaluator.py:33-100). Differences by design:

  * Sequences are padded to 512-frame buckets and all statistics are
    length-masked, so one compiled program serves any sequence length
    (the reference re-runs eager torch per sequence).
  * FK + 6890-vertex LBS runs under `lax.map` in fixed 128-frame blocks:
    memory stays bounded for arbitrarily long sequences while everything
    remains one jit region.
  * Means/stds replicate torch semantics exactly: `std(dim=0)` is the
    unbiased std over time per joint/vertex, then averaged.
  * Binary confusion/F1 use the conventional positive=1 layout with guarded
    denominators; the reference labels class 0 "positive"
    (evaluator.py:47). PARITY.md divergence #7; the exact flip
    relationship is pinned by tests/test_evaluator_parity.py.

Every metric definition here is pinned against an independent eager-torch
float64 replica in tests/test_evaluator_parity.py (rtol 1e-4).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import rotation as R
from mobileposer_tpu.kinematics.smpl import ParametricModel

_BUCKET = 512
_FK_BLOCK = 128


def _pad_to_bucket(x: np.ndarray, n_pad: int) -> np.ndarray:
    pad = n_pad - x.shape[0]
    if pad == 0:
        return np.asarray(x)
    # repeat the last frame: keeps rotations valid; masks exclude it anyway
    tail = np.repeat(np.asarray(x[-1:]), pad, axis=0)
    return np.concatenate([np.asarray(x), tail])


def _masked_mean(x, m):
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m) * (x.size // m.size), 1)


def _masked_std0_mean(x, m, n):
    """torch `x.std(dim=0).mean()` with a [N,1] validity mask over dim 0."""
    mean = jnp.sum(x * m, axis=0, keepdims=True) / jnp.maximum(n, 1)
    var = jnp.sum(((x - mean) ** 2) * m, axis=0) / jnp.maximum(n - 1, 1)
    return jnp.mean(jnp.sqrt(var))


class FullMotionEvaluator:
    """10-metric motion evaluator (reference: evaluator.py:269-343)."""

    def __init__(self, body_model: Optional[ParametricModel] = None,
                 joint_mask: Optional[Tuple[int, ...]] = C.EVAL_JOINT_MASK,
                 fps: int = C.datasets.fps, align_joint: int = 0):
        self.body = body_model or ParametricModel.from_file_or_synthetic(
            C.paths.smpl_file)
        self.joint_mask = None if joint_mask is None else np.asarray(joint_mask)
        self.fps = fps
        self.align_joint = align_joint
        self._compiled = {}

    # -- jitted core -------------------------------------------------------
    def _metrics(self, pose_p, pose_t, tran_p, tran_t, n_valid):
        f = self.fps
        N = pose_p.shape[0]
        body = self.body

        def fk_block(args):
            pp, tp = args
            return body.forward_kinematics(pp, tran=tp, calc_mesh=True)

        def run_fk(pose, tran):
            blocks = N // _FK_BLOCK
            pg, jp, vp = jax.lax.map(
                fk_block, (pose.reshape(blocks, _FK_BLOCK, 24, 3, 3),
                           tran.reshape(blocks, _FK_BLOCK, 3)))
            return (pg.reshape(N, 24, 3, 3), jp.reshape(N, 24, 3),
                    vp.reshape(N, -1, 3))

        pose_global_p, joint_p, vertex_p = run_fk(pose_p, tran_p)
        pose_global_t, joint_t, vertex_t = run_fk(pose_t, tran_t)

        t_idx = jnp.arange(N)
        m = (t_idx < n_valid).astype(pose_p.dtype)[:, None]      # [N, 1]
        n = n_valid.astype(pose_p.dtype)

        offset = (joint_t[:, self.align_joint] - joint_p[:, self.align_joint])[:, None]
        ve = jnp.linalg.norm(vertex_p + offset - vertex_t, axis=2)   # [N, V]
        je = jnp.linalg.norm(joint_p + offset - joint_t, axis=2)     # [N, 24]
        lae = R.radian_to_degree(R.angle_between(pose_p, pose_t)).reshape(N, 24)
        gae = R.radian_to_degree(
            R.angle_between(pose_global_p, pose_global_t)).reshape(N, 24)

        def jerk(x):
            jk = (x[3:] - 3 * x[2:-1] + 3 * x[1:-2] - x[:-3]) * (f ** 3)
            return jnp.linalg.norm(jk, axis=2)                      # [N-3, 24]

        jkp, jkt = jerk(joint_p), jerk(joint_t)
        m_jerk = (t_idx[:N - 3] + 3 < n_valid).astype(pose_p.dtype)[:, None]
        n_jerk = jnp.maximum(n - 3, 0)

        te = jnp.linalg.norm((joint_p[f:, :1] - joint_p[:-f, :1])
                             - (joint_t[f:, :1] - joint_t[:-f, :1]), axis=2) * 100
        m_te = (t_idx[:N - f] + f < n_valid).astype(pose_p.dtype)[:, None]
        n_te = jnp.maximum(n - f, 0)

        def stat(x, mask, count):
            return jnp.stack([_masked_mean(x, mask),
                              _masked_std0_mean(x, mask, count)])

        rows = [stat(je, m, n), stat(ve, m, n), stat(lae, m, n),
                stat(gae, m, n), stat(jkp, m_jerk, n_jerk),
                stat(jkt, m_jerk, n_jerk), stat(te, m_te, n_te)]
        if self.joint_mask is not None:
            rows += [stat(je[:, self.joint_mask], m, n),
                     stat(lae[:, self.joint_mask], m, n),
                     stat(gae[:, self.joint_mask], m, n)]
        else:
            rows += [jnp.zeros(2)] * 3
        return jnp.stack(rows)                                     # [10, 2]

    def __call__(self, pose_p, pose_t, tran_p=None, tran_t=None) -> np.ndarray:
        """pose_*: [N, 24, 3, 3] local rotations; tran_*: [N, 3] or None.
        Returns the [10, 2] (mean, std) table of evaluator.py:292-343."""
        pose_p = np.asarray(pose_p, np.float32).reshape(-1, 24, 3, 3)
        pose_t = np.asarray(pose_t, np.float32).reshape(-1, 24, 3, 3)
        n = pose_p.shape[0]
        tran_p = (np.zeros((n, 3), np.float32) if tran_p is None
                  else np.asarray(tran_p, np.float32).reshape(-1, 3))
        tran_t = (np.zeros((n, 3), np.float32) if tran_t is None
                  else np.asarray(tran_t, np.float32).reshape(-1, 3))
        n_pad = max(_BUCKET, math.ceil(n / _BUCKET) * _BUCKET)
        if n_pad not in self._compiled:
            self._compiled[n_pad] = jax.jit(self._metrics)
        out = self._compiled[n_pad](
            jnp.asarray(_pad_to_bucket(pose_p, n_pad)),
            jnp.asarray(_pad_to_bucket(pose_t, n_pad)),
            jnp.asarray(_pad_to_bucket(tran_p, n_pad)),
            jnp.asarray(_pad_to_bucket(tran_t, n_pad)),
            jnp.asarray(n, jnp.int32))
        return np.asarray(out)


# ---------------------------------------------------------------------------
# Binary classification metrics (reference: evaluator.py:33-100)
# ---------------------------------------------------------------------------

def binary_confusion_matrix(p: jnp.ndarray, t: jnp.ndarray,
                            is_after_sigmoid: bool = False) -> jnp.ndarray:
    """[2,2] matrix [[tp, fn], [fp, tn]] (reference: evaluator.py:47-62)."""
    pred = (p > (0.5 if is_after_sigmoid else 0.0)).astype(jnp.int32)
    t = t.astype(jnp.int32)
    tp = jnp.sum((pred == 1) & (t == 1))
    fn = jnp.sum((pred == 0) & (t == 1))
    fp = jnp.sum((pred == 1) & (t == 0))
    tn = jnp.sum((pred == 0) & (t == 0))
    return jnp.array([[tp, fn], [fp, tn]])


def binary_classification_errors(p: jnp.ndarray, t: jnp.ndarray,
                                 is_after_sigmoid: bool = False) -> jnp.ndarray:
    """[[precision+, precision-], [recall+, recall-], [f1+, f1-]]
    (reference: evaluator.py:65-100)."""
    (tp, fn), (fp, tn) = binary_confusion_matrix(p, t, is_after_sigmoid)
    eps = 1e-12
    prec_p = tp / jnp.maximum(tp + fp, 1)
    prec_n = tn / jnp.maximum(tn + fn, 1)
    rec_p = tp / jnp.maximum(tp + fn, 1)
    rec_n = tn / jnp.maximum(tn + fp, 1)
    f1_p = 2 * prec_p * rec_p / jnp.maximum(prec_p + rec_p, eps)
    f1_n = 2 * prec_n * rec_n / jnp.maximum(prec_n + rec_n, eps)
    return jnp.array([[prec_p, prec_n], [rec_p, rec_n], [f1_p, f1_n]])
