"""Training loop: optax per-module optimization, pjit data parallelism,
top-k checkpointing, finetune recipe.

Behavioral parity target: reference `mobileposer/train.py` (TrainingManager,
train.py:33-97), per-module `configure_optimizers` (AdamW for joints,
joints.py:114; Adam elsewhere, poser.py:147, footcontact.py:100,
velocity.py:121), Lightning ModelCheckpoint top-3 by validation loss
(train.py:48-58), and the finetune flow (finetune.sh + from_pretrained).

TPU re-design: one jitted, donated train step per module; the batch is
sharded over the mesh's `data` axis and parameters are replicated — XLA
inserts the gradient all-reduce over ICI (SURVEY §7.7). The same program
runs single-chip (no collectives) and multi-chip.
"""

from __future__ import annotations

import json
import os
import re
import time
from pathlib import Path
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mobileposer_tpu import config as C
from mobileposer_tpu.models import modules as M
from mobileposer_tpu.nn.lstm import init_rnn
from mobileposer_tpu.nn.torch_convert import export_to_npz, load_from_npz
from mobileposer_tpu.parallel.mesh import (
    make_mesh, pad_batch_to_multiple, replicate_params, shard_batch)

MODULE_NAMES = ("poser", "joints", "footcontact", "velocity")


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(module_name: str, lr: float) -> optax.GradientTransformation:
    """AdamW for joints (reference: joints.py:114), Adam for the rest."""
    if module_name == "joints":
        return optax.adamw(lr)
    return optax.adam(lr)


def loss_fn_for(module_name: str, body_model=None,
                backend: str = "auto_train") -> Callable:
    """Loss for one module. backend='auto_train' routes the LSTM through
    the fused Pallas training kernels on TPU (nn.lstm.resolve_train_backend
    — measured 1.7x on the grad step); pass 'xla' for sharded multi-chip
    steps (pallas_call has no GSPMD partitioning rule)."""
    import functools
    if module_name == "joints":
        return functools.partial(M.joints_loss, backend=backend)
    if module_name == "poser":
        return lambda p, b, r, train=True, time_major=False: M.poser_loss(
            p, b, r, body_model=body_model, train=train,
            backend=backend, time_major=time_major)
    if module_name == "footcontact":
        return functools.partial(M.footcontact_loss, backend=backend)
    if module_name == "velocity":
        return functools.partial(M.velocity_loss, backend=backend)
    raise ValueError(module_name)


def init_train_state(module_name: str, key: jax.Array, lr: float) -> TrainState:
    params = init_rnn(key, M.MODULE_CONFIGS[module_name])
    opt = make_optimizer(module_name, lr)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def make_train_step(module_name: str, lr: float, body_model=None,
                    time_major: bool = False, backend: str = "auto_train"):
    """Jitted, buffer-donated (state, batch, rng) -> (state, loss).

    time_major=True expects batch arrays laid out [T, B, ...] (lengths
    stays [B]): the LSTM core is time-major internally, so feeding
    time-major batches (a free host-side transpose in the input pipeline)
    skips the per-step [B,T]<->[T,B] transpose round-trip on device.

    backend: see loss_fn_for — 'auto_train' (fused Pallas kernels on TPU)
    or 'xla' (required for batch-sharded multi-device steps).
    """
    opt = make_optimizer(module_name, lr)
    loss_fn = loss_fn_for(module_name, body_model, backend=backend)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        def compute(params):
            return loss_fn(params, batch, rng, train=True,
                           time_major=time_major)

        loss, grads = jax.value_and_grad(compute)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # failure containment: non-finite loss OR gradients (bad batch,
        # exploding RNN backprop with a still-finite loss) must not poison
        # the parameters — keep the previous state and surface the loss
        grads_ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
            jnp.asarray(True))
        ok = jnp.isfinite(loss) & grads_ok
        params, opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            (params, opt_state), (state.params, state.opt_state))
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))


def make_shard_map_train_step(module_name: str, lr: float, mesh,
                              body_model=None, backend: str = "auto_train"):
    """Explicitly-partitioned data-parallel train step via jax.shard_map.

    The GSPMD path (make_train_step + sharded inputs) lets XLA partition
    the program — which cannot partition a pallas_call, so sharded steps
    fall back to backend='xla'. Here each device instead runs the WHOLE
    per-shard program manually (params replicated, batch sharded on dim 0)
    — pallas kernels see only local arrays, so the fused training kernels
    (ops/lstm_train_pallas.py) compose with multi-chip data parallelism;
    gradients and the loss are psum-averaged over the mesh and the
    optimizer update is computed identically on every device.

    Loss semantics: the mean of per-shard losses. Identical to the global
    loss for equal per-shard valid-frame counts (always true for
    full-length windows, the training common case); for ragged batches the
    masked normalization weights shards slightly differently than the
    global mean, and the noise/dropout draw geometry is per-shard rather
    than global — use the GSPMD step where bit-equality with single-device
    training matters more than kernel speed.

    Batch layout is batch-major ([B, T, ...], lengths [B]); the mesh size
    must divide B (pad_batch_to_multiple).
    """
    from jax.sharding import PartitionSpec as P

    from mobileposer_tpu.parallel.mesh import DATA_AXIS

    opt = make_optimizer(module_name, lr)
    loss_fn = loss_fn_for(module_name, body_model, backend=backend)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        # distinct augmentation noise / dropout per shard: without the
        # fold, every device would draw the identical [B/n, ...] noise
        # tensor for its rows (n_dev-fold duplicated augmentation)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def compute(params):
            return loss_fn(params, batch, rng, train=True)

        loss, grads = jax.value_and_grad(compute)(state.params)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grads_ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
            jnp.asarray(True))
        ok = jnp.isfinite(loss) & grads_ok
        params, opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            (params, opt_state), (state.params, state.opt_state))
        return TrainState(params, opt_state, state.step + 1), loss

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_multi_train_step(lr: float, body_model=None,
                          backend: str = "auto_train",
                          module_names=MODULE_NAMES, mesh=None):
    """One jitted step advancing ALL modules concurrently on one batch.

    The four modules are independent given a batch (the reference trains
    them sequentially, train.py:153-154 — four passes over the data). Here
    a single program computes sum-of-losses with one value_and_grad over
    the combined params dict: the modules' parameter trees are disjoint,
    so the gradient of the sum IS each module's own gradient. Each module
    keeps its own optimizer (AdamW for joints) and its own non-finite
    containment flag.

    Why it is faster than four sequential steps (measured, design.md
    §6.2): one dispatch per batch instead of four, batches are assembled
    and sharded once per epoch-pass instead of once per module, and the
    small footcontact program (4% MFU standalone) rides along with the
    big ones instead of paying its own per-step overheads.

    `states` is a dict {module: TrainState}; returns (states, losses)
    with per-module scalar losses. With `mesh` spanning >1 device the
    step is built as an explicitly-partitioned shard_map program (same
    semantics as make_shard_map_train_step: per-shard rng fold, psum-mean
    loss/grads, Pallas kernels stay usable).
    """
    opts = {n: make_optimizer(n, lr) for n in module_names}
    loss_fns = {n: loss_fn_for(n, body_model, backend=backend)
                for n in module_names}

    multi_device = mesh is not None and mesh.devices.size > 1

    def step(states: Dict[str, TrainState], batch: dict, rng: jax.Array):
        if multi_device:
            from mobileposer_tpu.parallel.mesh import DATA_AXIS
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rngs = {n: jax.random.fold_in(rng, i)
                for i, n in enumerate(module_names)}
        params = {n: states[n].params for n in module_names}

        def compute(ps):
            losses = {n: loss_fns[n](ps[n], batch, rngs[n], train=True)
                      for n in module_names}
            total = sum(losses.values())
            return total, losses

        (_, losses), grads = jax.value_and_grad(
            compute, has_aux=True)(params)
        if multi_device:
            losses = jax.lax.pmean(losses, DATA_AXIS)
            grads = jax.lax.pmean(grads, DATA_AXIS)
        new_states = {}
        for n in module_names:
            st = states[n]
            updates, opt_state = opts[n].update(grads[n], st.opt_state,
                                                st.params)
            new_params = optax.apply_updates(st.params, updates)
            grads_ok = jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads[n],
                jnp.asarray(True))
            ok = jnp.isfinite(losses[n]) & grads_ok
            new_params, opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                (new_params, opt_state), (st.params, st.opt_state))
            new_states[n] = TrainState(new_params, opt_state, st.step + 1)
        return new_states, losses

    if multi_device:
        from jax.sharding import PartitionSpec as P

        from mobileposer_tpu.parallel.mesh import DATA_AXIS
        step = jax.shard_map(step, mesh=mesh,
                             in_specs=(P(), P(DATA_AXIS), P()),
                             out_specs=(P(), P()),
                             check_vma=False)
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(module_name: str, body_model=None,
                   time_major: bool = False):
    # validation stays on XLA: no gradients, so the training kernels'
    # residual writes (acts + carry sequences) would be pure overhead
    loss_fn = loss_fn_for(module_name, body_model, backend="xla")
    return jax.jit(lambda params, batch, rng: loss_fn(
        params, batch, rng, train=False, time_major=time_major))


def make_multi_eval_step(body_model=None, module_names=MODULE_NAMES):
    """All modules' validation losses in one jit region (one dispatch)."""
    loss_fns = {n: loss_fn_for(n, body_model, backend="xla")
                for n in module_names}

    def step(params: Dict[str, dict], batch: dict, rng: jax.Array):
        rngs = {n: jax.random.fold_in(rng, i)
                for i, n in enumerate(module_names)}
        return {n: loss_fns[n](params[n], batch, rngs[n], train=False)
                for n in module_names}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Checkpointing (reference: train.py:48-58, utils/file_utils.py:17-27)
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"epoch=(\d+)-valloss=([0-9.]+)\.npz$")


class Checkpointer:
    """Keep the top-k lowest-validation-loss checkpoints as .npz files."""

    def __init__(self, directory, top_k: int = 3):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k

    def should_save(self, val_loss: float) -> bool:
        """True when val_loss would enter the top-k (avoids writing a
        multi-MB checkpoint every epoch only to prune it)."""
        cands = self._candidates()
        return len(cands) < self.top_k or val_loss < cands[-1][0]

    def save(self, params: dict, epoch: int, val_loss: float) -> Path:
        path = self.dir / f"epoch={epoch}-valloss={val_loss:.4f}.npz"
        # one batched device->host fetch (per-leaf np.asarray pays a
        # transport round trip per leaf on tunneled devices)
        export_to_npz(jax.device_get(params), path)
        self._prune()
        return path

    def _candidates(self):
        out = []
        for p in self.dir.glob("epoch=*-valloss=*.npz"):
            m = _CKPT_RE.search(p.name)
            if m:
                out.append((float(m.group(2)), p))
        return sorted(out, key=lambda x: x[0])

    def _prune(self):
        for _, p in self._candidates()[self.top_k:]:
            p.unlink()

    def best(self) -> Optional[Path]:
        cands = self._candidates()
        return cands[0][1] if cands else None


def get_best_checkpoint(directory) -> Optional[Path]:
    """Best checkpoint in a module dir (reference: utils/file_utils.py:23-27)."""
    return Checkpointer(directory).best()


# -- full-state checkpoint / resume (no reference equivalent: the reference
# saves weights only and cannot resume optimizer state) ----------------------

def save_training_state(path, module_name: str, state: TrainState,
                        epoch: int) -> Path:
    """Persist params + optimizer state + counters for exact resume."""
    from mobileposer_tpu.utils.io import savez_typed
    leaves, _ = jax.tree_util.tree_flatten(
        (state.params, state.opt_state, state.step))
    leaves = jax.device_get(leaves)          # one batched fetch
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    savez_typed(path, {"__module__": module_name, "__epoch__": epoch,
                       **arrays})
    return Path(path)


def restore_training_state(path, lr: float):
    """Restore (TrainState, next_epoch). The tree structure comes from a
    fresh init of the same module, so restores survive refactors of array
    contents but not of structure."""
    from mobileposer_tpu.utils.io import loadz_typed
    z = loadz_typed(path)
    module_name = str(z["__module__"])
    epoch = int(z["__epoch__"])
    template = init_train_state(module_name, jax.random.PRNGKey(0), lr)
    _, treedef = jax.tree_util.tree_flatten(
        (template.params, template.opt_state, template.step))
    n = len([k for k in z if k.startswith("leaf_")])
    # host-side numpy: the caller's replicate_params does one batched put
    leaves = [np.asarray(z[f"leaf_{i}"]) for i in range(n)]
    params, opt_state, step = jax.tree_util.tree_unflatten(treedef, leaves)
    return TrainState(params, opt_state, step), module_name, epoch + 1


def get_checkpoint_path(root=None) -> Path:
    """Next numbered run dir under checkpoints/ (reference: train.py:100-113)."""
    root = Path(root) if root else C.paths.checkpoint
    root.mkdir(parents=True, exist_ok=True)
    nums = [int(p.name) for p in root.iterdir() if p.name.isdigit()]
    return root / str(max(nums) + 1 if nums else 1)


def _train_val_split(n: int, seed: int, val_fraction: float):
    """Deterministic sample-level split shared by train_module/train_all
    (reference: data.py:151-153). Returns (val_idx, train_idx, rng)."""
    rng_np = np.random.default_rng(seed)
    perm = rng_np.permutation(n)
    n_val = max(1, int(n * val_fraction))
    return perm[:n_val], perm[n_val:], rng_np


def _epoch_batches(dataset, idxs, batch_size: int, W: int, shuffle_rng):
    """One epoch of assembled batches over `idxs` (drop-last semantics);
    THE single batching implementation for both training recipes."""
    order = (shuffle_rng.permutation(len(idxs)) if shuffle_rng
             else np.arange(len(idxs)))
    bs = max(1, min(batch_size, len(idxs)))
    for b0 in range(0, len(order) - bs + 1, bs):
        yield dataset._assemble(idxs[order[b0:b0 + bs]], W)


# ---------------------------------------------------------------------------
# Training manager (reference: train.py:33-97)
# ---------------------------------------------------------------------------

class TrainingManager:
    """Sequential per-module training with a shared dataset and mesh."""

    def __init__(self, finetune: Optional[str] = None,
                 fast_dev_run: bool = False, mesh=None,
                 hypers: Optional[C.TrainHypers] = None,
                 dp_impl: str = "gspmd", backend: str = "auto_train"):
        """dp_impl: 'gspmd' (default — XLA-partitioned step, exact
        sharded-vs-single agreement, XLA kernels when the mesh spans >1
        device) or 'shard_map' (explicitly partitioned per-device step —
        keeps the fused Pallas training kernels on multi-chip meshes;
        per-shard masked-loss weighting, see make_shard_map_train_step).

        backend: 'auto_train' (default — fused Pallas kernels on TPU,
        grads pinned at 1e-5), 'auto_train_bf16res' (bf16 stored
        residuals: +14-27% step throughput on v5e-1 for ~1e-2 relative
        gradient noise, design.md §6.3), or 'xla'."""
        if dp_impl not in ("gspmd", "shard_map"):
            raise ValueError(f"dp_impl must be 'gspmd' or 'shard_map', "
                             f"got {dp_impl!r}")
        if backend not in ("auto_train", "auto_train_bf16res", "xla"):
            raise ValueError(f"backend must be 'auto_train', "
                             f"'auto_train_bf16res' or 'xla', got {backend!r}")
        self.finetune = finetune
        self.fast_dev_run = fast_dev_run
        self.hypers = hypers or (C.finetune_hypers if finetune else C.train_hypers)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.dp_impl = dp_impl
        self.backend = backend

    def train_module(self, module_name: str, dataset, checkpoint_path,
                     init_params: Optional[dict] = None,
                     body_model=None, seed: Optional[int] = None,
                     val_fraction: float = 0.1,
                     log_file: Optional[str] = None,
                     metrics: Optional[str] = None,
                     resume_from=None) -> Dict:
        """Train one module over `dataset` (a PoseDataset). Returns dict with
        final params and loss history. 90/10 train/val split mirrors the
        reference (data.py:151-153). `resume_from` restarts from a full
        training-state checkpoint (params + optimizer + epoch); a
        `train_state.npz` is refreshed every epoch for crash recovery.

        `metrics` is a sink spec ('jsonl:p,csv:p,tensorboard:dir,wandb:proj',
        utils/metrics.py — the reference's wandb logging, train.py:40-46,
        generalized for a zero-egress host); `log_file` is kept as shorthand
        for a JSONL sink."""
        h = self.hypers
        seed = h.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        key, init_key = jax.random.split(key)

        start_epoch = 0
        state = init_train_state(module_name, init_key, h.lr)
        if resume_from is not None:
            state, ckpt_module, start_epoch = restore_training_state(
                resume_from, h.lr)
            assert ckpt_module == module_name, (
                f"checkpoint is for {ckpt_module}, not {module_name}")
        elif init_params is not None:
            # keep numpy: replicate_params below does the one batched put
            state = state._replace(params=init_params)
        n_dev = len(self.mesh.devices.flatten())
        state = state._replace(params=replicate_params(state.params, self.mesh))

        if self.dp_impl == "shard_map" and n_dev > 1:
            # explicitly-partitioned DP: keeps the fused Pallas training
            # kernels on multi-chip meshes (GSPMD cannot partition a
            # pallas_call)
            train_step = make_shard_map_train_step(
                module_name, h.lr, self.mesh, body_model,
                backend=self.backend)
        else:
            # GSPMD step; fused kernels only single-device there (a
            # batch-sharded pallas_call would be replicated by GSPMD)
            train_step = make_train_step(module_name, h.lr, body_model,
                                         backend=(self.backend if n_dev == 1
                                                  else "xla"))
        eval_step = make_eval_step(module_name, body_model)

        val_idx, train_idx, rng_np = _train_val_split(len(dataset), seed,
                                                      val_fraction)

        W = C.datasets.window_length
        epochs = 1 if self.fast_dev_run else h.num_epochs
        history = {"train_loss": [], "val_loss": []}
        ckpt = Checkpointer(Path(checkpoint_path) / module_name)
        from mobileposer_tpu.utils.metrics import JSONLSink, MultiSink, make_sinks
        sink = make_sinks(metrics)
        if log_file:
            sink = MultiSink(sink.sinks + [JSONLSink(log_file)])

        def batches_from(idxs, shuffle_rng):
            return _epoch_batches(dataset, idxs, h.batch_size, W, shuffle_rng)

        from mobileposer_tpu.data.prefetch import BatchPrefetcher

        def run_epoch(epoch: int, step_i: int):
            nonlocal state, key
            t0 = time.time()
            losses = []
            with BatchPrefetcher(batches_from(train_idx, rng_np)) as prefetch:
                for batch in prefetch:
                    batch = pad_batch_to_multiple(batch, n_dev)
                    batch = shard_batch(batch, self.mesh)
                    key, sub = jax.random.split(key)
                    state, loss = train_step(state, batch, sub)
                    losses.append(loss)
                    step_i += 1
                    if self.fast_dev_run and step_i >= 2:
                        break
            train_loss = (float(np.mean(jax.device_get(losses)))
                          if losses else float("nan"))

            val_losses = []
            for batch in batches_from(val_idx, None):
                batch = pad_batch_to_multiple(batch, n_dev)
                batch = shard_batch(batch, self.mesh)
                key, sub = jax.random.split(key)
                val_losses.append(eval_step(state.params, batch, sub))
                if self.fast_dev_run:
                    break
            val_loss = (float(np.mean(jax.device_get(val_losses)))
                        if val_losses else train_loss)

            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            if np.isfinite(val_loss) and ckpt.should_save(val_loss):
                ckpt.save(state.params, epoch, val_loss)
            # full-state snapshot for crash recovery: every 5 epochs + last
            # (each write is tens of MB — per-epoch writes dominated small
            # epochs on this host)
            if epoch % 5 == 4 or epoch == epochs - 1:
                save_training_state(ckpt.dir / "train_state.npz", module_name,
                                    state, epoch)
            rec = {"module": module_name, "epoch": epoch,
                   "train_loss": train_loss, "val_loss": val_loss,
                   "seconds": round(time.time() - t0, 3)}
            print(json.dumps(rec))
            sink.log(rec)
            return step_i

        step_i = 0
        try:
            for epoch in range(start_epoch, epochs):
                step_i = run_epoch(epoch, step_i)
        finally:
            sink.close()
        return {"params": jax.device_get(state.params),
                "history": history, "checkpointer": ckpt}

    def train_all(self, dataset, checkpoint_path, body_model=None,
                   seed: Optional[int] = None, val_fraction: float = 0.1,
                   metrics: Optional[str] = None,
                   log_file: Optional[str] = None,
                   module_names=MODULE_NAMES,
                   init_params: Optional[Dict[str, dict]] = None,
                   resume: bool = False) -> Dict:
        """Train ALL modules concurrently in one pass over the data.

        Same recipe surface as four train_module calls (identical checkpoint
        layout — combine_weights works unchanged; same JSONL record schema),
        but each batch is assembled, padded and sharded ONCE and a single
        jitted program advances every module (make_multi_train_step). The
        reference trains modules sequentially (train.py:153-154: four passes
        over the dataset); measured end-to-end recipe speedup on v5e-1 is
        recorded in design.md §6.2.

        `resume=True` restores each module's `train_state.npz` under
        `checkpoint_path/<module>/` (written every 5 epochs + last).
        Restores only from a CONSISTENT snapshot set: every module present
        at the SAME epoch. A mixed-epoch set (crash mid-save) cannot be
        resumed without double-applying epochs to the further-ahead
        modules, so training restarts fresh instead.
        """
        h = self.hypers
        seed = h.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, len(module_names) + 1)
        key, init_keys = keys[0], keys[1:]

        ckpts = {n: Checkpointer(Path(checkpoint_path) / n)
                 for n in module_names}
        start_epoch = 0
        states = {}
        if resume:
            epochs_found = []
            for n in module_names:
                p = ckpts[n].dir / "train_state.npz"
                if p.exists():
                    st, mod, nxt = restore_training_state(p, h.lr)
                    assert mod == n
                    states[n] = st
                    epochs_found.append(nxt)
            if (len(epochs_found) == len(module_names)
                    and len(set(epochs_found)) == 1):
                start_epoch = epochs_found[0]
            else:
                if epochs_found:
                    print(json.dumps({
                        "resume": "inconsistent train_state snapshots "
                                  f"(epochs {sorted(set(epochs_found))}); "
                                  "restarting from scratch"}))
                states = {}
        if not states:
            states = {n: init_train_state(n, k, h.lr)
                      for n, k in zip(module_names, init_keys)}
            if init_params:
                # warm-start (finetune recipe): replace params, keep fresh
                # optimizer state — same semantics as train_module's
                # init_params
                for n, p in init_params.items():
                    if n in states:
                        # keep numpy: replicate_params below does the one
                        # batched transfer (per-leaf jnp.asarray pays a
                        # round trip per leaf)
                        states[n] = states[n]._replace(params=p)
        n_dev = len(self.mesh.devices.flatten())
        states = {n: s._replace(params=replicate_params(s.params, self.mesh))
                  for n, s in states.items()}

        train_step = _concurrent_train_step_for(self, body_model,
                                                module_names)
        eval_step = make_multi_eval_step(body_model, module_names)

        val_idx, train_idx, rng_np = _train_val_split(len(dataset), seed,
                                                      val_fraction)

        W = C.datasets.window_length
        epochs = 1 if self.fast_dev_run else h.num_epochs
        history = {m: {"train_loss": [], "val_loss": []} for m in module_names}
        from mobileposer_tpu.utils.metrics import JSONLSink, MultiSink, make_sinks
        sink = make_sinks(metrics)
        if log_file:
            sink = MultiSink(sink.sinks + [JSONLSink(log_file)])

        def batches_from(idxs, shuffle_rng):
            return _epoch_batches(dataset, idxs, h.batch_size, W, shuffle_rng)

        from mobileposer_tpu.data.prefetch import BatchPrefetcher

        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                losses = {m: [] for m in module_names}
                with BatchPrefetcher(batches_from(train_idx, rng_np)) as pf:
                    for step_i, batch in enumerate(pf):
                        batch = pad_batch_to_multiple(batch, n_dev)
                        batch = shard_batch(batch, self.mesh)
                        key, sub = jax.random.split(key)
                        states, batch_losses = train_step(states, batch, sub)
                        for m in module_names:
                            losses[m].append(batch_losses[m])
                        if self.fast_dev_run and step_i >= 1:
                            break
                fetched = jax.device_get(losses)    # ONE fetch round for
                train_losses = {m: (float(np.mean(fetched[m]))  # all modules
                                    if fetched[m] else float("nan"))
                                for m in module_names}

                val_acc = {m: [] for m in module_names}
                for batch in batches_from(val_idx, None):
                    batch = pad_batch_to_multiple(batch, n_dev)
                    batch = shard_batch(batch, self.mesh)
                    key, sub = jax.random.split(key)
                    vl = eval_step({m: states[m].params for m in module_names},
                                   batch, sub)
                    for m in module_names:
                        val_acc[m].append(vl[m])
                    if self.fast_dev_run:
                        break
                dt = round(time.time() - t0, 3)
                val_fetched = jax.device_get(val_acc)
                for m in module_names:
                    val_loss = (float(np.mean(val_fetched[m]))
                                if val_fetched[m] else train_losses[m])
                    history[m]["train_loss"].append(train_losses[m])
                    history[m]["val_loss"].append(val_loss)
                    if np.isfinite(val_loss) and ckpts[m].should_save(val_loss):
                        ckpts[m].save(states[m].params, epoch, val_loss)
                    if epoch % 5 == 4 or epoch == epochs - 1:
                        save_training_state(ckpts[m].dir / "train_state.npz",
                                            m, states[m], epoch)
                    rec = {"module": m, "epoch": epoch,
                           "train_loss": train_losses[m],
                           "val_loss": history[m]["val_loss"][-1],
                           "seconds": dt, "concurrent": True}
                    print(json.dumps(rec))
                    sink.log(rec)
        finally:
            sink.close()
        return {"params": jax.device_get(
                    {m: states[m].params for m in module_names}),
                "history": history, "checkpointers": ckpts}



def _concurrent_train_step_for(manager, body_model,
                               module_names=MODULE_NAMES):
    """The right make_multi_train_step flavor for the manager's mesh:
    single-device → fused Pallas kernels; gspmd multi → XLA kernels with
    GSPMD-sharded inputs; shard_map multi → explicitly partitioned with
    Pallas kernels."""
    n_dev = len(manager.mesh.devices.flatten())
    if n_dev == 1:
        return make_multi_train_step(manager.hypers.lr, body_model,
                                     backend=manager.backend,
                                     module_names=module_names)
    if manager.dp_impl == "shard_map":
        return make_multi_train_step(manager.hypers.lr, body_model,
                                     backend=manager.backend,
                                     mesh=manager.mesh,
                                     module_names=module_names)
    return make_multi_train_step(manager.hypers.lr, body_model,
                                 backend="xla", module_names=module_names)


def combine_weights(checkpoint_path, out_path=None,
                    finetune: Optional[str] = None) -> Path:
    """Merge each module's best checkpoint into one weights file
    (reference: combine_weights.py:41-56). With `finetune`, joints/poser
    come from the finetuned_{dataset} subdir (combine_weights.py:27-31)."""
    checkpoint_path = Path(checkpoint_path)
    combined = {}
    for name in MODULE_NAMES:
        module_dir = checkpoint_path / name
        if finetune and name in ("poser", "joints"):
            module_dir = checkpoint_path / f"finetuned_{finetune}" / name
        best = get_best_checkpoint(module_dir)
        if best is None:
            raise FileNotFoundError(f"no checkpoint for module {name} "
                                    f"in {module_dir}")
        combined[name] = load_from_npz(best)
    default_name = "model_finetuned.npz" if finetune else "base_model.npz"
    out_path = Path(out_path or (checkpoint_path / default_name))
    export_to_npz(combined, out_path)
    return out_path


def load_combined_weights(path) -> dict:
    """Load a combined weights file into the MobilePoserNet params pytree."""
    return load_from_npz(path)
