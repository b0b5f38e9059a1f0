"""Pallas TPU kernels: fused LSTM layer scan for TRAINING (custom VJP).

The XLA training path (nn/lstm._lstm_scan under jax.grad) differentiates
the scan: both the forward and the BPTT backward emit one small recurrent
matmul plus a gate-math fusion per timestep, each a separate kernel with
its own HBM round-trip for the carry, and w_hh re-read from HBM every
step in both directions. This module fuses each direction of a layer into
one `pallas_call` per pass:

  * forward: grid (batch_tiles, T); w_hh lives in VMEM for the whole
    window; the (h, c) carry persists in VMEM scratch; per-step gate
    activations (i, f, g, o) and the carried (h, c) sequences are written
    out as residuals for the backward pass;
  * backward: grid (batch_tiles, T) iterated in REVERSED time via the
    index maps; w_hh^T and the dw_hh accumulator live in VMEM across the
    whole window; emits dx_proj (from which the caller derives dW_ih and
    db via one big MXU matmul), per-tile dw_hh, and (dh0, dc0).

Masked variable-length batches are supported with the exact semantics of
nn/lstm._lstm_scan: masked steps hold the carry and emit zeros, so the
final carry equals the state at each sequence's last valid frame.

Numerics: gates and carries accumulate in fp32 (same as the inference
kernels); gradients are pinned to the XLA path at 1e-5 by
tests/test_train_pallas.py.

`residual_dtype=jnp.bfloat16` (opt-in; backend='auto_train_bf16res')
halves the residual HBM traffic — the dominant bytes of BPTT at H=256:
each step stores acts[4H]+h[H]+c[H] per sequence, read back by the
backward pass. In-kernel arithmetic stays fp32 (residuals are cast on
read); only the stored activations round to bf16, so gradients carry
~1e-2 relative noise — standard mixed-precision training territory, but
NOT the 1e-5-pinned default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, h0_ref, c0_ref, m_ref,
                ys_ref, acts_ref, hseq_ref, cseq_ref, hT_ref, cT_ref,
                h_s, c_s):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    h = h_s[:]
    c = c_s[:]
    gates = x_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(x_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = m_ref[0, 0].astype(jnp.float32)[:, None]       # [tile_b, 1]
    h_keep = m * h_new + (1.0 - m) * h
    c_keep = m * c_new + (1.0 - m) * c
    h_s[:] = h_keep
    c_s[:] = c_keep

    ys_ref[0] = (m * h_new).astype(ys_ref.dtype)
    acts_ref[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(acts_ref.dtype)
    hseq_ref[0] = h_keep.astype(hseq_ref.dtype)
    cseq_ref[0] = c_keep.astype(cseq_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hT_ref[:] = h_keep.astype(hT_ref.dtype)
        cT_ref[:] = c_keep.astype(cT_ref.dtype)


def _fwd_call(x_proj, w_hh, h0, c0, mask, interpret: bool,
              residual_dtype=jnp.float32):
    T, B, H4 = x_proj.shape
    H = H4 // 4
    dtype = x_proj.dtype
    rdt = residual_dtype
    tile_b = B if B <= 256 else 256
    while B % tile_b:
        tile_b //= 2

    x_spec = pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    # mask rides as [T, 1, B] so the block's trailing dims tile legally
    m_spec = pl.BlockSpec((1, 1, tile_b), lambda b, t: (t, 0, b),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _fwd_kernel,
        grid=(B // tile_b, T),
        in_specs=[x_spec, w_spec, s_spec, s_spec, m_spec],
        out_specs=[y_spec, a_spec, y_spec, y_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),    # ys (masked outputs)
            jax.ShapeDtypeStruct((T, B, H4), rdt),     # acts i,f,g,o
            jax.ShapeDtypeStruct((T, B, H), rdt),      # h carry seq
            jax.ShapeDtypeStruct((T, B, H), rdt),      # c carry seq
            jax.ShapeDtypeStruct((B, H), dtype),       # h_T
            jax.ShapeDtypeStruct((B, H), dtype),       # c_T
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, H), jnp.float32)] * 2,
        interpret=interpret,
    )(x_proj, w_hh, h0, c0, mask[:, None, :])


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(dy_ref, dhT_ref, dcT_ref, acts_ref, cnew_ref,
                hprev_ref, cprev_ref, wT_ref, m_ref,
                dx_ref, dw_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, dw_s):
    t = pl.program_id(1)                   # 0 .. T-1, REAL time = T-1-t
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:].astype(jnp.float32)
        dc_s[:] = dcT_ref[:].astype(jnp.float32)
        dw_s[:] = jnp.zeros_like(dw_s)

    dh_carry = dh_s[:]
    dc_carry = dc_s[:]
    m = m_ref[0, 0].astype(jnp.float32)[:, None]

    # residuals may be stored bf16 (residual_dtype): cast on read, keep all
    # arithmetic in f32 (no-op casts for the f32 default)
    acts = acts_ref[0].astype(jnp.float32)
    H = dh_carry.shape[-1]
    i = acts[:, 0 * H:1 * H]
    f = acts[:, 1 * H:2 * H]
    g = acts[:, 2 * H:3 * H]
    o = acts[:, 3 * H:4 * H]
    c_new = cnew_ref[0].astype(jnp.float32)
    c_prev = cprev_ref[0].astype(jnp.float32)
    h_prev = hprev_ref[0].astype(jnp.float32)

    tanh_c = jnp.tanh(c_new)
    dh_new = m * (dh_carry + dy_ref[0].astype(jnp.float32))
    dc_new = m * dc_carry
    do = dh_new * tanh_c
    dc_cur = dc_new + dh_new * o * (1.0 - tanh_c * tanh_c)
    di = dc_cur * g
    dg = dc_cur * i
    df = dc_cur * c_prev
    dc_prev_cell = dc_cur * f

    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)                                         # [tile_b, 4H]

    dx_ref[0] = dgates.astype(dx_ref.dtype)
    # dw_hh += h_prev^T @ dgates  (contract the batch-tile dimension)
    dw_s[:] += jax.lax.dot_general(
        h_prev, dgates, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dh_prev = (1.0 - m) * dh_carry + jnp.dot(
        dgates.astype(wT_ref.dtype), wT_ref[:],
        preferred_element_type=jnp.float32)
    dc_prev = (1.0 - m) * dc_carry + dc_prev_cell
    dh_s[:] = dh_prev
    dc_s[:] = dc_prev

    @pl.when(t == T - 1)
    def _():
        dw_ref[0] = dw_s[:].astype(dw_ref.dtype)
        dh0_ref[:] = dh_prev.astype(dh0_ref.dtype)
        dc0_ref[:] = dc_prev.astype(dc0_ref.dtype)


def _bwd_call(dy, dhT, dcT, acts, c_new_seq, h_prev_seq, c_prev_seq,
              w_hh, mask, interpret: bool):
    T, B, H = dy.shape
    H4 = 4 * H
    dtype = dy.dtype
    tile_b = B if B <= 256 else 256
    while B % tile_b:
        tile_b //= 2
    n_tiles = B // tile_b

    rev_t = lambda b, t: (T - 1 - t, b, 0)
    rev_m = lambda b, t: (T - 1 - t, 0, b)
    y_spec = pl.BlockSpec((1, tile_b, H), rev_t, memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, tile_b, H4), rev_t, memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, tile_b), rev_m, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H4, H), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((1, H, H4), lambda b, t: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    dx, dw_tiles, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles, T),
        in_specs=[y_spec, s_spec, s_spec, a_spec, y_spec, y_spec, y_spec,
                  w_spec, m_spec],
        out_specs=[a_spec, dw_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H4), dtype),   # dx_proj
            jax.ShapeDtypeStruct((n_tiles, H, H4), jnp.float32),
            jax.ShapeDtypeStruct((B, H), dtype),       # dh0
            jax.ShapeDtypeStruct((B, H), dtype),       # dc0
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
        interpret=interpret,
    )(dy, dhT, dcT, acts, c_new_seq, h_prev_seq, c_prev_seq,
      jnp.swapaxes(w_hh, 0, 1), mask[:, None, :])
    return dx, dw_tiles.sum(axis=0).astype(w_hh.dtype), dh0, dc0


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def lstm_layer_train(x_proj, w_hh, h0, c0, mask, interpret=False,
                     residual_dtype=jnp.float32):
    """One LSTM layer-direction scan with a fused Pallas forward AND
    backward. Same contract as nn/lstm._lstm_scan: x_proj [T, B, 4H]
    (input projection incl. both biases), mask [T, B] (1.0 = valid frame;
    pass ones for full-length). Returns (ys, h_T, c_T) where masked steps
    hold the carry and emit zeros. residual_dtype=jnp.bfloat16 halves the
    stored-residual HBM traffic at ~1e-2 relative gradient noise."""
    ys, _, _, _, hT, cT = _fwd_call(x_proj, w_hh, h0, c0, mask, interpret,
                                    residual_dtype)
    return ys, hT, cT


def _train_fwd(x_proj, w_hh, h0, c0, mask, interpret,
               residual_dtype=jnp.float32):
    ys, acts, hseq, cseq, hT, cT = _fwd_call(x_proj, w_hh, h0, c0, mask,
                                             interpret, residual_dtype)
    res = (acts, hseq, cseq, h0, c0, w_hh, mask)
    return (ys, hT, cT), res


def _train_bwd(interpret, residual_dtype, res, cots):
    acts, hseq, cseq, h0, c0, w_hh, mask = res
    dy, dhT, dcT = cots
    # prev-carry sequences: carry BEFORE each step (kept in the residual
    # dtype; the backward kernel casts on read)
    h_prev_seq = jnp.concatenate([h0.astype(hseq.dtype)[None], hseq[:-1]])
    c_prev_seq = jnp.concatenate([c0.astype(cseq.dtype)[None], cseq[:-1]])
    dx, dw, dh0, dc0 = _bwd_call(dy, dhT, dcT, acts, cseq,
                                 h_prev_seq, c_prev_seq, w_hh, mask,
                                 interpret)
    return (dx, dw, dh0.astype(h0.dtype), dc0.astype(c0.dtype),
            jnp.zeros_like(mask))


lstm_layer_train.defvjp(_train_fwd, _train_bwd)


# ---------------------------------------------------------------------------
# Multi-layer (bi)LSTM forward on the training kernels
# ---------------------------------------------------------------------------

def lstm_forward_train_pallas(params_layers, x: jnp.ndarray,
                              lengths=None, h0c0=None,
                              bidirectional: bool = True,
                              interpret: bool = False,
                              time_major: bool = False,
                              residual_dtype=jnp.float32):
    """Drop-in for nn.lstm.lstm_forward on the fused training kernels.

    Differentiable wrt params_layers / x / h0c0 with gradients computed by
    the fused backward kernel. Supports masked variable length.
    residual_dtype=jnp.bfloat16: see module docstring (opt-in).
    """
    from mobileposer_tpu.nn.lstm import _reverse_by_length

    if time_major:
        T, B, _ = x.shape
    else:
        B, T, _ = x.shape
    n_dir = 2 if bidirectional else 1
    n_layers = len(params_layers)
    H = params_layers[0]["fwd"]["w_hh"].shape[0]
    dtype = x.dtype

    xs = x if time_major else jnp.swapaxes(x, 0, 1)
    if lengths is None:
        mask = jnp.ones((T, B), dtype)
    else:
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
            x_proj = inp @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
            sidx = li * n_dir + di
            ys, h_t, c_t = lstm_layer_train(x_proj, p["w_hh"],
                                            h0_all[sidx], c0_all[sidx],
                                            mask, interpret, residual_dtype)
            if dname == "bwd":
                ys = _reverse_by_length(ys, lengths)
            outs.append(ys)
            h_finals.append(h_t)
            c_finals.append(c_t)
        xs = outs[0] if n_dir == 1 else jnp.concatenate(outs, axis=-1)

    y = xs if time_major else jnp.swapaxes(xs, 0, 1)
    return y, (jnp.stack(h_finals), jnp.stack(c_finals))
