"""Pose-evaluation driver: the 8-row metric report, offline/online protocol
and translation-drift windows.

Behavioral parity target: reference `mobileposer/evaluate.py:16-107`.
The reference prints `errs[9]` for both "SIP Error" and "Masked Angular
Error" (a latent defect, SURVEY §2); we keep both rows so printouts align,
but label them honestly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mobileposer_tpu import config as C
from mobileposer_tpu.evaluation.evaluator import FullMotionEvaluator
from mobileposer_tpu.models.net import MobilePoserNet

_IGNORED = np.asarray(C.joint_set.ignored)

METRIC_NAMES = (
    "SIP Error (deg)", "Angular Error (deg)", "Masked Angular Error (deg)",
    "Positional Error (cm)", "Masked Positional Error (cm)",
    "Mesh Error (cm)", "Jitter Error (100m/s^3)", "Distance Error (cm)")


class PoseEvaluator:
    """8-row error report (reference: evaluate.py:16-36)."""

    def __init__(self, body_model=None):
        self._eval_fn = FullMotionEvaluator(
            body_model, joint_mask=C.EVAL_JOINT_MASK, fps=C.datasets.fps)

    def eval(self, pose_p, pose_t, tran_p=None, tran_t=None) -> np.ndarray:
        pose_p = np.array(pose_p, np.float32).reshape(-1, 24, 3, 3)
        pose_t = np.array(pose_t, np.float32).reshape(-1, 24, 3, 3)
        pose_p[:, _IGNORED] = np.eye(3, dtype=np.float32)
        pose_t[:, _IGNORED] = np.eye(3, dtype=np.float32)
        errs = self._eval_fn(pose_p, pose_t, tran_p=tran_p, tran_t=tran_t)
        return np.stack([errs[9], errs[3], errs[9], errs[0] * 100,
                         errs[7] * 100, errs[1] * 100, errs[4] / 100, errs[6]])

    @staticmethod
    def print(errors: np.ndarray) -> None:
        for i, name in enumerate(METRIC_NAMES):
            print("%s: %.2f (+/- %.2f)" % (name, errors[i, 0], errors[i, 1]))


def translation_drift(tran_p: np.ndarray, tran_t: np.ndarray,
                      window_sizes: Sequence[int] = range(1, 8)) -> Dict[int, float]:
    """Mean translation error over windows where GT travels `w` meters
    (reference: evaluate.py:66-92). Returns {window_m: mean_err_m} for
    windows that occurred."""
    tran_p = np.asarray(tran_p).reshape(-1, 3)
    tran_t = np.asarray(tran_t).reshape(-1, 3)
    move = np.zeros(len(tran_t))
    move[1:] = np.cumsum(np.linalg.norm(tran_t[1:] - tran_t[:-1], axis=1))
    out = {}
    for w in window_sizes:
        frame_pairs = []
        start, end = 0, 1
        while end < len(move):
            if move[end] - move[start] < w:
                end += 1
            else:
                if not frame_pairs or frame_pairs[-1][1] != end:
                    frame_pairs.append((start, end))
                start += 1
        errs = [np.linalg.norm((tran_t[e] - tran_t[s]) - (tran_p[e] - tran_p[s]))
                / (move[e] - move[s]) * w for s, e in frame_pairs]
        if errs:
            out[w] = float(np.mean(errs))
    return out


def forward_offline_batched(net: MobilePoserNet, params: dict,
                            imu_batch: jnp.ndarray, lengths: jnp.ndarray):
    """Offline inference over several padded sequences at once.

    imu_batch [N, T_pad, 60], lengths [N]. Returns (pose [N,T,24,3,3],
    joints [N,T,24,3], tran [N,T,3], contact [N,T,2]); entries beyond each
    sequence's length are garbage to slice off. The translation fusion is
    vmapped per sequence — N sequences cost one forward instead of N.
    """
    from mobileposer_tpu.models.net import _fuse_velocity, forward
    pose, joints, vel, contact, _ = forward(
        params, imu_batch, net.body_model, lengths=lengths)
    N, T = imu_batch.shape[:2]
    joints = joints.reshape(N, T, 24, 3)
    fuse = jax.vmap(lambda j, v, c: _fuse_velocity(j, v, c, net.floor_y))
    tran = fuse(joints, vel, contact)
    return pose, joints, tran, contact


def _bucket_len(n: int, bucket: int) -> int:
    return max(bucket, -(-n // bucket) * bucket)


def _sharding_helpers(mesh):
    """(shard_rows, shard_streams, shard_state) placement helpers for a
    1-D data mesh (None -> identity jnp.asarray placements)."""
    if mesh is None:
        def asarr(x, dtype=None):
            return jnp.asarray(x, dtype)
        # state passes through untouched: the jitted call transfers the
        # whole pytree in one round (per-leaf placement would pay a
        # transport round per leaf — CLAUDE.md)
        return asarr, asarr, (lambda st, n: st)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mobileposer_tpu.parallel import shard_stream_state

    # host-side dtype cast, then ONE host->sharded transfer per array
    # (jnp.asarray first would commit the whole batch to device 0 and
    # reshard device-to-device — a double transfer)
    def shard_rows(x, dtype=None):            # [B, ...]: batch-dim sharded
        x = np.asarray(x, dtype)
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def shard_streams(x, dtype=None):         # [T, S, ...]: stream sharded
        x = np.asarray(x, dtype)
        spec = P(None, "data", *([None] * (np.ndim(x) - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def shard_state(st, n_streams):
        # exact per-field stream axes (STREAM_AXES) + one device_put for
        # the whole pytree (per-leaf puts pay a transport round per leaf)
        return shard_stream_state(st, n_streams, mesh)

    return shard_rows, shard_streams, shard_state


def _predict_offline_batched(net, params, imus, bucket, max_batch,
                             dtype=np.float32, mesh=None):
    """Offline predictions for a list of [T_i, 60] sequences, batched by
    padded-length group. Returns [(pose [T_i,24,3,3], tran [T_i,3]), ...].

    Sequences are grouped by their padded bucket length and stacked (chunks
    padded up to a power-of-two batch so jit compiles O(log) programs per
    length group, not one per chunk size); N sequences cost ~one dispatch
    per group instead of N (reference iterates sequences one by one,
    evaluate.py:48-58).
    """
    from mobileposer_tpu.evaluation.evaluator import _pad_to_bucket
    shard_rows, _, _ = _sharding_helpers(mesh)
    n_dev = 1 if mesh is None else mesh.devices.size
    run = jax.jit(lambda p, b, l: forward_offline_batched(net, p, b, l))
    ns = [x.shape[0] for x in imus]
    groups: Dict[int, List[int]] = {}
    for i, n in enumerate(ns):
        groups.setdefault(_bucket_len(n, bucket), []).append(i)
    out: List = [None] * len(imus)
    for P, idxs in sorted(groups.items()):
        for c0 in range(0, len(idxs), max_batch):
            chunk = idxs[c0:c0 + max_batch]
            # pow2 batch bucket, at least one row per device when sharded
            n_pad = max(1 << (len(chunk) - 1).bit_length(), n_dev)
            batch = np.zeros((n_pad, P, imus[0].shape[-1]), np.float32)
            lengths = np.zeros((n_pad,), np.int32)
            for k, i in enumerate(chunk):
                batch[k] = _pad_to_bucket(imus[i], P)
                lengths[k] = ns[i]
            pose, _, tran, _ = run(params, shard_rows(batch, dtype),
                                   shard_rows(lengths))
            pose, tran = jax.device_get((pose, tran))   # one fetch round
            pose = np.asarray(pose, np.float32)
            tran = np.asarray(tran, np.float32)
            for k, i in enumerate(chunk):
                out[i] = (pose[k, :ns[i]], tran[k, :ns[i]])
    return out


def _predict_online_batched(net, params, imus, num_future_frames, bucket,
                            max_batch, mode: str = "exact",
                            dtype=np.float32, mesh=None):
    """ONLINE-protocol predictions for a list of sequences, batched as
    independent streams (reference protocol: evaluate.py:62-64 — per-frame
    streaming with `num_future_frames` of last-frame padding).

    Each sequence becomes one stream of `forward_online_sequence_batched`
    with fresh state; streams are padded to a common scan length per group.
    Outputs at frame t depend only on frames <= t, so tail padding cannot
    affect the sliced-off prefix.

    mode='carry' runs the same protocol through carry-mode streaming
    (models/streaming.py) — emission timing is identical, so the metrics
    quantify exactly the approximation's accuracy cost (the parity-day
    A/B for whether carry mode may serve)."""
    import functools
    _, shard_streams, shard_state = _sharding_helpers(mesh)
    n_dev = 1 if mesh is None else mesh.devices.size
    jdt = jnp.dtype(dtype)
    if mode == "carry":
        run = jax.jit(net.forward_carry_sequence_batched)
        init_state = functools.partial(net.init_carry_state_batched,
                                       dtype=jdt)
    else:
        run = jax.jit(net.forward_online_sequence_batched)
        init_state = functools.partial(net.init_online_state_batched,
                                       dtype=jdt)
    ns = [x.shape[0] + num_future_frames for x in imus]
    groups: Dict[int, List[int]] = {}
    for i, n in enumerate(ns):
        groups.setdefault(_bucket_len(n, bucket), []).append(i)
    out: List = [None] * len(imus)
    for P, idxs in sorted(groups.items()):
        for c0 in range(0, len(idxs), max_batch):
            chunk = idxs[c0:c0 + max_batch]
            n_pad = max(1 << (len(chunk) - 1).bit_length(), n_dev)
            frames = np.zeros((P, n_pad, imus[0].shape[-1]), np.float32)
            for k, i in enumerate(chunk):
                seq = np.concatenate(
                    [imus[i], np.repeat(imus[i][-1:], P - imus[i].shape[0],
                                        axis=0)])
                frames[:, k] = seq
            state = shard_state(init_state(n_pad), n_pad)
            (poses, _, trans, _), _ = run(params, state,
                                          shard_streams(frames, dtype))
            poses, trans = jax.device_get((poses, trans))
            poses = np.asarray(poses, np.float32)
            trans = np.asarray(trans, np.float32)
            for k, i in enumerate(chunk):
                out[i] = (poses[num_future_frames:ns[i], k],
                          trans[num_future_frames:ns[i], k])
    return out


def evaluate_pose(net: MobilePoserNet, params: dict, dataset,
                  online: bool = False, evaluate_tran: bool = False,
                  num_future_frames: int = C.model_config.future_frames,
                  verbose: bool = True, batch_sequences: bool = True,
                  max_batch: int = 64, online_mode: str = "exact",
                  bf16: bool = False, mesh=None, offline: bool = True):
    """Offline (and optionally online) evaluation over a sequence dataset
    (reference: evaluate.py:39-107).

    dataset yields (imu [T,60], pose_local [T,24,3,3], joints, tran [T,3]).
    Returns dict with 'offline' [8,2], optional 'online' [8,2] and
    'tran_errors' {window: mean}.

    offline=False skips the offline pass and its metrics entirely
    (requires online=True and evaluate_tran=False — translation drift is
    an offline metric). Useful when only the ONLINE serving config is
    being labelled (e.g. the quantized legs of scripts/carry_ab.py);
    int8-quantized params themselves trace through every path — offline,
    exact and carry (ops/quant.py + the nn/lstm.py int8 routing).

    batch_sequences=True (default) groups sequences by padded length and
    runs both protocols batched — N sequences per group cost ~one dispatch.
    False keeps the per-sequence path (same numbers, used as the oracle in
    tests).
    """
    if bf16 and not batch_sequences:
        raise ValueError("bf16=True requires batch_sequences=True")
    if mesh is not None and not batch_sequences:
        raise ValueError("mesh sharding requires batch_sequences=True")
    if not offline and (not online or evaluate_tran or not batch_sequences):
        raise ValueError("offline=False requires online=True, "
                         "evaluate_tran=False and batch_sequences=True")
    if online_mode not in ("exact", "carry"):
        # validate up front: an unknown mode must not silently fall back to
        # the exact path (a parity A/B would then compare exact vs exact
        # and wrongly report a zero accuracy delta)
        raise ValueError(f"online_mode must be 'exact' or 'carry', "
                         f"got {online_mode!r}")
    evaluator = PoseEvaluator(net.body_model)
    offline_errs, online_errs = [], []
    tran_errors: Dict[int, List[float]] = {w: [] for w in range(1, 8)}

    # Pad every sequence to the evaluator's bucket size so one compiled
    # program serves any length (jit specializes on T; per-sequence
    # compiles cost seconds each over slow transports). Outputs are sliced
    # to the true length; all streaming/fusion state flows forward in
    # time, so the valid prefix is identical to an unpadded run.
    from mobileposer_tpu.evaluation.evaluator import _BUCKET, _pad_to_bucket

    items = list(dataset)
    imus = [np.asarray(item[0], np.float32) for item in items]

    if batch_sequences:
        # bf16: opt-in inference dtype (weights/state/frames) — measured
        # +16% dataset-eval throughput on v5e-1 (design.md §6.2). Metric
        # math stays f32 on the cast-back outputs; parity-day runs keep
        # the f32 default.
        dtype = np.float32
        if bf16:
            from mobileposer_tpu.nn import cast_params
            params = cast_params(params, jnp.bfloat16)
            dtype = jnp.bfloat16
        if mesh is not None:
            # data-parallel evaluation: params replicated once, every
            # prediction batch sharded over the mesh's data axis. The
            # forward has no cross-row ops so GSPMD inserts no
            # collectives; metrics agree with single-device to <=1e-4
            # (test-pinned — batch padding and per-shard tiling can move
            # low-order bits, so the agreement is numeric, not bitwise)
            from mobileposer_tpu.parallel import replicate_params
            params = replicate_params(params, mesh)
        offline_preds = (_predict_offline_batched(net, params, imus, _BUCKET,
                                                  max_batch, dtype=dtype,
                                                  mesh=mesh)
                         if offline else [None] * len(items))
        online_preds = (_predict_online_batched(net, params, imus,
                                                num_future_frames, _BUCKET,
                                                max_batch, mode=online_mode,
                                                dtype=dtype, mesh=mesh)
                        if online else [None] * len(items))
    else:
        if online_mode != "exact":
            raise ValueError("online_mode='carry' requires "
                             "batch_sequences=True")
        forward_offline = jax.jit(net.forward_offline)
        forward_online_seq = (jax.jit(net.forward_online_sequence)
                              if online else None)

        def _pad_bucket(x):
            n = x.shape[0]
            return _pad_to_bucket(np.asarray(x), _bucket_len(n, _BUCKET)), n

        offline_preds, online_preds = [], []
        for imu in imus:
            imu_padded, n = _pad_bucket(imu)
            pose_p, _, tran_p, _ = forward_offline(
                params, jnp.asarray(imu_padded), length=jnp.asarray(n))
            offline_preds.append((np.asarray(pose_p)[:n],
                                  np.asarray(tran_p)[:n]))
            if online:
                # frame-by-frame protocol with last-frame padding
                # (reference: evaluate.py:62-64), as one scanned dispatch
                state = net.init_online_state()
                frames = np.concatenate(
                    [imu, np.repeat(imu[-1:], num_future_frames, axis=0)])
                frames_padded, n_frames = _pad_bucket(frames)
                (poses, _, trans, _), _ = forward_online_seq(
                    params, state, jnp.asarray(frames_padded))
                online_preds.append(
                    (np.asarray(poses)[num_future_frames:n_frames],
                     np.asarray(trans)[num_future_frames:n_frames]))
            else:
                online_preds.append(None)

    for item, off_p, on_p in zip(items, offline_preds, online_preds):
        pose_t, tran_t = item[1], item[3]

        if online:
            pose_po, tran_po = on_p
            online_errs.append(evaluator.eval(pose_po, pose_t,
                                              tran_p=tran_po, tran_t=tran_t))

        if off_p is None:
            continue
        pose_p, tran_p = off_p

        if evaluate_tran:
            for w, err in translation_drift(tran_p, tran_t).items():
                tran_errors[w].append(err)

        offline_errs.append(evaluator.eval(pose_p, pose_t,
                                           tran_p=tran_p, tran_t=tran_t))

    result = {}
    if offline_errs:
        result["offline"] = np.mean(np.stack(offline_errs), axis=0)
        if verbose:
            print("============== offline ================")
            PoseEvaluator.print(result["offline"])
    if online_errs:
        result["online"] = np.mean(np.stack(online_errs), axis=0)
        if verbose:
            print("============== online ================")
            PoseEvaluator.print(result["online"])
    if evaluate_tran:
        result["tran_errors"] = {w: float(np.mean(v))
                                 for w, v in tran_errors.items() if v}
        if verbose:
            print("translation drift:", result["tran_errors"])
    return result
