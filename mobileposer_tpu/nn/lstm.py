"""Scan-based LSTM core for TPU.

Behavioral parity target: the reference RNN primitive
(`mobileposer/models/rnn.py:9-33`): linear -> ReLU (+dropout on input) ->
multi-layer (bi)LSTM -> linear, with optional carried hidden state. The
torch version relies on cuDNN packed sequences; on TPU the idiomatic
equivalents are:

  * one big batched matmul for the input projection of ALL timesteps
    (keeps the MXU busy: [T*B, D] @ [D, 4H]), with only the small
    recurrent matmul [B, H] @ [H, 4H] inside the `lax.scan` carry loop;
  * variable-length sequences via masked carry updates instead of packing
    (packed sequences are a GPU-ism; masking is free under XLA fusion);
  * bidirectionality via a per-sequence length-aware reversal so the
    backward scan consumes only valid frames.

Weight layout follows torch's LSTM convention (gate order i, f, g, o) so
released PyTorch checkpoints convert by transpose alone
(see `nn/torch_convert.py`).

All functions are pure; parameters are plain pytrees (nested dicts), so
they compose with jit / vmap / grad / pjit without a framework dependency.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LSTMConfig(NamedTuple):
    """Static architecture of one RNN block (reference: rnn.py:9-18)."""
    n_input: int
    n_output: int
    n_hidden: int
    n_layers: int = 2
    bidirectional: bool = True
    dropout: float = 0.4


# ---------------------------------------------------------------------------
# Initialization (matches torch defaults: U(-1/sqrt(H), 1/sqrt(H)))
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_lstm_layer(key, n_in: int, n_hidden: int, dtype=jnp.float32) -> dict:
    """One direction of one LSTM layer. Kernels stored input-major for
    right-multiplication (x @ W): w_ih [n_in, 4H], w_hh [H, 4H]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(n_hidden)
    return {
        "w_ih": _uniform(k1, (n_in, 4 * n_hidden), bound, dtype),
        "w_hh": _uniform(k2, (n_hidden, 4 * n_hidden), bound, dtype),
        "b_ih": _uniform(k3, (4 * n_hidden,), bound, dtype),
        "b_hh": _uniform(k4, (4 * n_hidden,), bound, dtype),
    }


def init_linear(key, n_in: int, n_out: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    return {"w": _uniform(k1, (n_in, n_out), bound, dtype),
            "b": _uniform(k2, (n_out,), bound, dtype)}


def init_rnn(key, cfg: LSTMConfig, dtype=jnp.float32) -> dict:
    """Full RNN block parameters (reference: rnn.py:13-18)."""
    n_dir = 2 if cfg.bidirectional else 1
    keys = jax.random.split(key, 2 + cfg.n_layers * n_dir)
    params = {
        "linear1": init_linear(keys[0], cfg.n_input, cfg.n_hidden, dtype),
        "linear2": init_linear(keys[1], cfg.n_hidden * n_dir, cfg.n_output, dtype),
        "lstm": [],
    }
    ki = 2
    for layer in range(cfg.n_layers):
        n_in = cfg.n_hidden if layer == 0 else cfg.n_hidden * n_dir
        dirs = {}
        for d in (["fwd", "bwd"] if cfg.bidirectional else ["fwd"]):
            dirs[d] = init_lstm_layer(keys[ki], n_in, cfg.n_hidden, dtype)
            ki += 1
        params["lstm"].append(dirs)
    return params


# ---------------------------------------------------------------------------
# Core scan
# ---------------------------------------------------------------------------

def _gate_update(gates: jnp.ndarray, c: jnp.ndarray):
    """Apply the LSTM gate nonlinearity to precomputed gates [.., 4H].

    THE single implementation of the cell math (gate order i, f, g, o — a
    parity invariant, see CLAUDE.md): both the scan core below and the
    carry-mode single steps (models/streaming.py) go through it."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    c_new = f * c + i * jnp.tanh(g)
    return o * jnp.tanh(c_new), c_new


def lstm_cell_step(p: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One LSTM step from a raw input: projects x, adds both biases, and
    applies the shared gate update. p is one direction of one layer
    (init_lstm_layer layout), or an int8-quantized direction
    (ops.quant.quantize_lstm_direction layout) — the dtype of the kernel
    picks the implementation at trace time, so the whole carry-mode stack
    (models/streaming.py) runs unchanged on quantized params."""
    if jnp.dtype(p["w_ih"].dtype) == jnp.int8:
        from mobileposer_tpu.ops.quant import lstm_cell_step_int8
        return lstm_cell_step_int8(p, x, h, c)
    gates = x @ p["w_ih"] + (p["b_ih"] + p["b_hh"]) + h @ p["w_hh"]
    return _gate_update(gates, c)


def _lstm_scan(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
               h0: jnp.ndarray, c0: jnp.ndarray,
               mask: Optional[jnp.ndarray],
               w_hh_scale: Optional[jnp.ndarray] = None):
    """Scan an LSTM over time.

    x_proj: [T, B, 4H] precomputed input projection (+ both biases)
    w_hh:   [H, 4H] (float, or int8 when w_hh_scale is given)
    h0/c0:  [B, H]
    mask:   [T, B] 1.0 where the frame is valid, or None for full-length.
    w_hh_scale: [4H] per-column dequant scale — runs the recurrent matmul
            on the W8A8 path (ops/quant.py int8_recurrent_gates).

    Returns (hidden sequence [T, B, H], (h_T, c_T)).
    Masked steps hold the carry (so (h_T, c_T) equals the state at each
    sequence's last valid frame) and emit zeros.
    """
    def step(carry, inp):
        h, c = carry
        if mask is None:
            xp = inp
        else:
            xp, m = inp
        if w_hh_scale is None:
            rec = h @ w_hh
        else:
            from mobileposer_tpu.ops.quant import int8_recurrent_gates
            rec = int8_recurrent_gates(h, w_hh, w_hh_scale).astype(h.dtype)
        h_new, c_new = _gate_update(xp + rec, c)
        if mask is not None:
            m = m[:, None]
            c_new = m * c_new + (1 - m) * c
            h_out = m * h_new
            h_new = m * h_new + (1 - m) * h
            return (h_new, c_new), h_out
        return (h_new, c_new), h_new

    xs = x_proj if mask is None else (x_proj, mask)
    # NOTE: lax.scan unroll measured as a pure loss here (v5e-1, train
    # step B=256 T=125: unroll=5 -3%..-13%, unroll=25 -22%..-34%) — the
    # recurrent matmul leaves no fusion headroom and unrolling just bloats
    # the program. Keep unroll=1 (docs/design.md 6.2).
    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), xs)
    return ys, (h_t, c_t)


def _reverse_by_length(x: jnp.ndarray, lengths: Optional[jnp.ndarray]):
    """Reverse [T, B, ...] along time per sequence length.

    With lengths, frame t of sequence b maps to frame (length[b]-1-t); the
    padded tail stays in place. Applying this twice is the identity, so the
    same function un-reverses the backward scan's outputs.
    """
    T = x.shape[0]
    if lengths is None:
        return x[::-1]
    t_idx = jnp.arange(T)[:, None]                      # [T, 1]
    src = jnp.where(t_idx < lengths[None, :], lengths[None, :] - 1 - t_idx, t_idx)
    return jnp.take_along_axis(
        x, src.reshape((T,) + (x.shape[1],) + (1,) * (x.ndim - 2)), axis=0)


def resolve_train_backend(backend: str = "auto_train") -> str:
    """'auto_train' -> the fused Pallas training kernels on TPU
    (ops/lstm_train_pallas.py: measured 1.7x on a B=256 T=125 biLSTM grad
    step on v5e-1), XLA elsewhere. Pass 'xla' explicitly for sharded
    multi-chip train steps — pallas_call has no partitioning rule, so
    GSPMD would replicate it."""
    if backend == "auto_train":
        target = "pallas_train"
    elif backend == "auto_train_bf16res":
        # bf16 stored residuals: halves BPTT's residual HBM traffic for
        # ~1e-2 relative gradient noise (ops/lstm_train_pallas.py)
        target = "pallas_train_bf16res"
    else:
        return backend
    try:
        return target if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _masked_pallas_diffable(interpret, x_proj, w_hh, h0, c0, mask):
    """The masked inference kernel with gradients via XLA recompute.

    Forward runs ops.lstm_pallas.lstm_layer_masked_pallas (4.6x vs the
    masked XLA scan); the kernel itself stores no residuals, so the
    backward pass re-runs the layer as the XLA scan under jax.vjp.
    Differentiating backend='auto' with lengths on TPU therefore works
    (it used to error: the raw pallas_call has no VJP rule); grad paths
    that care about speed should still use 'auto_train' (fused
    residual-storing training kernels, ops/lstm_train_pallas.py).
    `interpret` enables the pallas interpreter for CPU tests.
    """
    from mobileposer_tpu.ops.lstm_pallas import lstm_layer_masked_pallas
    return lstm_layer_masked_pallas(x_proj, w_hh, h0, c0, mask,
                                    interpret=interpret)


def _masked_pallas_fwd(interpret, x_proj, w_hh, h0, c0, mask):
    return (_masked_pallas_diffable(interpret, x_proj, w_hh, h0, c0, mask),
            (x_proj, w_hh, h0, c0, mask))


def _masked_pallas_bwd(interpret, res, g):
    x_proj, w_hh, h0, c0, mask = res
    _, vjp = jax.vjp(
        lambda xp, w, h, c: _lstm_scan(xp, w, h, c, mask),
        x_proj, w_hh, h0, c0)
    gx, gw, gh, gc = vjp(g)
    return gx, gw, gh, gc, jnp.zeros_like(mask)


_masked_pallas_diffable.defvjp(_masked_pallas_fwd, _masked_pallas_bwd)


def _use_pallas(backend: str, bidirectional: bool, lengths) -> bool:
    """'auto' picks the pallas kernels where they measure faster on TPU:
    bidirectional layers — full-length via ops/lstm_pallas.py's fused
    bilstm kernel, ragged batches via the masked single-direction kernel
    (bi 3.6x, uni 4.6x vs the masked XLA scan at B=64, T=512 — the
    masked XLA scan pays extra where-ops per step, so the kernel wins
    even unidirectionally there). Full-length UNIdirectional scans are
    the one case XLA wins; they stay on the XLA path under 'auto'."""
    if backend == "pallas":
        return True
    if backend != "auto":
        return False
    try:
        is_tpu = jax.default_backend() == "tpu"
    except Exception:
        is_tpu = False
    return is_tpu and (bidirectional or lengths is not None)


def lstm_forward(params_layers, x: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 h0c0: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 bidirectional: bool = True,
                 backend: str = "xla",
                 time_major: bool = False):
    """Multi-layer (bi)LSTM.

    params_layers: list of {"fwd": layer, ["bwd": layer]} dicts
    x:       [B, T, D] batch-major input ([T, B, D] when time_major=True)
    lengths: [B] int32 valid lengths, or None (= all T)
    h0c0:    optional initial state (h0, c0), each [n_layers*n_dir, B, H]
             stacked in torch order (layer0 fwd, layer0 bwd, layer1 fwd, ...)
    backend: 'xla' (lax.scan), 'pallas' (fused kernel, full-length only),
             'auto' (pallas where it wins on TPU), 'pallas_train' (fused
             fwd+bwd kernels with custom VJP — for grad paths; supports
             masking), or 'auto_train' (pallas_train on TPU, else xla)
    time_major: keep inputs/outputs in [T, B, *] layout — composites that
             chain several RNN blocks avoid a transpose round-trip per block
             (measured ~4 ms per 256x45 window pass on v5e)

    Returns (y [B, T, H*n_dir] (or [T, B, ...] if time_major),
    (h_T, c_T) stacked like h0c0).
    """
    if backend in ("auto_train", "auto_train_bf16res"):
        backend = resolve_train_backend(backend)
    quantized = jnp.dtype(params_layers[0]["fwd"]["w_ih"].dtype) == jnp.int8
    if quantized and backend in ("pallas_train", "pallas_train_bf16res"):
        raise ValueError(
            "int8-quantized params are inference-only (jnp.round has no "
            "gradient); use float params for training backends")
    if backend in ("pallas", "pallas_train", "pallas_train_bf16res"):
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "<unavailable>"
        if platform != "tpu":
            raise ValueError(
                f"backend={backend!r} forces the Pallas TPU kernels but "
                f"jax.default_backend() is {platform!r}; they "
                "do not lower on this platform. Use 'auto'/'auto_train' "
                "(falls back to XLA automatically) or call the "
                "mobileposer_tpu.ops kernels directly with interpret=True "
                "for CPU testing.")
    if backend in ("pallas_train", "pallas_train_bf16res"):
        from mobileposer_tpu.ops.lstm_train_pallas import (
            lstm_forward_train_pallas)
        rdt = jnp.bfloat16 if backend.endswith("bf16res") else jnp.float32
        return lstm_forward_train_pallas(params_layers, x, lengths, h0c0,
                                         bidirectional=bidirectional,
                                         time_major=time_major,
                                         residual_dtype=rdt)
    use_pallas = _use_pallas(backend, bidirectional, lengths)
    if use_pallas and lengths is None:
        from mobileposer_tpu.ops.lstm_pallas import lstm_forward_pallas
        return lstm_forward_pallas(params_layers, x, h0c0,
                                   bidirectional=bidirectional,
                                   time_major=time_major)
    if time_major:
        T, B, _ = x.shape
    else:
        B, T, _ = x.shape
    n_dir = 2 if bidirectional else 1
    n_layers = len(params_layers)
    H = params_layers[0]["fwd"]["w_hh"].shape[0]
    dtype = x.dtype

    xs = x if time_major else jnp.swapaxes(x, 0, 1)     # [T, B, D]
    mask = None
    if lengths is not None:
        mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(dtype)

    if h0c0 is None:
        zeros = jnp.zeros((n_layers * n_dir, B, H), dtype)
        h0_all, c0_all = zeros, zeros
    else:
        h0_all, c0_all = h0c0

    h_finals, c_finals = [], []
    for li, layer in enumerate(params_layers):
        outs = []
        for di, dname in enumerate(["fwd", "bwd"][:n_dir]):
            p = layer[dname]
            inp = xs if dname == "fwd" else _reverse_by_length(xs, lengths)
            # Input projection for all T at once — one MXU-shaped matmul
            # (int8 x int8 -> int32 when the layer is W8A8-quantized).
            from mobileposer_tpu.ops.lstm_pallas import _project_timesteps
            x_proj = _project_timesteps(inp, p, dtype)
            sidx = li * n_dir + di
            if use_pallas and quantized:
                # inference-only kernel: no VJP wrapper (int8 has no grad).
                # mask is always non-None here: the full-length pallas
                # case early-returned via lstm_forward_pallas above.
                from mobileposer_tpu.ops.lstm_pallas import (
                    lstm_layer_masked_pallas_int8)
                assert mask is not None
                ys, (h_t, c_t) = lstm_layer_masked_pallas_int8(
                    x_proj, p["w_hh"], p["w_hh_scale"],
                    h0_all[sidx], c0_all[sidx], mask)
            elif use_pallas:
                ys, (h_t, c_t) = _masked_pallas_diffable(
                    False, x_proj, p["w_hh"], h0_all[sidx], c0_all[sidx],
                    mask)
            else:
                ys, (h_t, c_t) = _lstm_scan(
                    x_proj, p["w_hh"], h0_all[sidx], c0_all[sidx], mask,
                    w_hh_scale=p.get("w_hh_scale"))
            if dname == "bwd":
                ys = _reverse_by_length(ys, lengths)
            outs.append(ys)
            h_finals.append(h_t)
            c_finals.append(c_t)
        xs = outs[0] if n_dir == 1 else jnp.concatenate(outs, axis=-1)

    y = xs if time_major else jnp.swapaxes(xs, 0, 1)    # [B, T, H*n_dir]
    return y, (jnp.stack(h_finals), jnp.stack(c_finals))


# ---------------------------------------------------------------------------
# Full RNN block (linear -> relu -> LSTM -> linear)
# ---------------------------------------------------------------------------

def rnn_apply(params: dict, cfg: LSTMConfig, x: jnp.ndarray,
              lengths: Optional[jnp.ndarray] = None,
              h0c0: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              train: bool = False,
              dropout_rng: Optional[jax.Array] = None,
              backend: str = "xla",
              time_major: bool = False):
    """Apply the RNN block (reference: rnn.py:20-33).

    x: [B, T, n_input]. Returns (y [B, T, n_output], (h_T, c_T)).
    Dropout (rate cfg.dropout) is applied after relu(linear1(x)) when
    train=True, matching the reference's `dropout(relu(linear1(x)))`
    placement (rnn.py:22).
    """
    if train and jnp.dtype(
            params["lstm"][0]["fwd"]["w_ih"].dtype) == jnp.int8:
        # catch this at the entry point regardless of backend: with
        # backend='xla' the int8 scan would otherwise trace fine and
        # jax.grad would fail later with an obscure integer-dtype error
        raise ValueError(
            "int8-quantized params are inference-only (jnp.round has no "
            "gradient); use float params for training")
    hidden = jax.nn.relu(x @ params["linear1"]["w"] + params["linear1"]["b"])
    if train and cfg.dropout > 0.0:
        assert dropout_rng is not None, "train=True requires dropout_rng"
        keep = 1.0 - cfg.dropout
        dmask = jax.random.bernoulli(dropout_rng, keep, hidden.shape)
        hidden = jnp.where(dmask, hidden / keep, 0.0)
    y, hc = lstm_forward(params["lstm"], hidden, lengths, h0c0,
                         bidirectional=cfg.bidirectional, backend=backend,
                         time_major=time_major)
    y = y @ params["linear2"]["w"] + params["linear2"]["b"]
    return y, hc


def rnn_zero_state(cfg: LSTMConfig, batch: int, dtype=jnp.float32):
    n_dir = 2 if cfg.bidirectional else 1
    z = jnp.zeros((cfg.n_layers * n_dir, batch, cfg.n_hidden), dtype)
    return (z, z)
