"""Pallas TPU kernel: fused LSTM layer scan.

The scan-LSTM core (nn/lstm.py) splits each layer into (a) one large
MXU-friendly input projection over all timesteps and (b) a `lax.scan` whose
body is the small recurrent matmul + gate math. This kernel replaces (b)
with a single `pallas_call`:

  * grid = (T,): pallas iterates the time dimension sequentially on-core,
    auto-pipelining the HBM->VMEM loads of each timestep's input projection
    (double-buffered) behind the recurrent compute;
  * the recurrent weights w_hh live in VMEM for the whole window — they are
    loaded from HBM exactly once per call instead of once per scan step;
  * the (h, c) carry lives in VMEM scratch, persisting across grid steps;
  * the recurrent matmul [B, H] @ [H, 4H] runs on the MXU at fp32
    accumulation; gate math is VPU element-wise.

Interface mirrors `nn/lstm._lstm_scan` (full-length path); masking variants
stay on the XLA path. Use `interpret=True` for CPU tests.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cell_math(gates, c):
    """LSTM gate nonlinearity on precomputed f32 gates [B, 4H] (order
    i, f, g, o — the parity invariant). The single in-kernel gate
    implementation, shared by every float and int8 kernel below."""
    H = c.shape[-1]
    i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _lstm_step_kernel(x_proj_ref, w_hh_ref, h0_ref, c0_ref,
                      ys_ref, h_out_ref, c_out_ref,
                      h_scratch, c_scratch):
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        # the carry accumulates in fp32 regardless of the IO dtype
        h_scratch[:] = h0_ref[:].astype(jnp.float32)
        c_scratch[:] = c0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    c = c_scratch[:]
    gates = x_proj_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(x_proj_ref.dtype), w_hh_ref[:],
        preferred_element_type=jnp.float32)
    h_new, c_new = _cell_math(gates, c)

    h_scratch[:] = h_new
    c_scratch[:] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        h_out_ref[:] = h_new.astype(h_out_ref.dtype)
        c_out_ref[:] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                      h0: jnp.ndarray, c0: jnp.ndarray,
                      interpret: bool = False):
    """Fused LSTM layer scan (full-length sequences).

    x_proj: [T, B, 4H] input projection incl. biases; w_hh: [H, 4H];
    h0/c0: [B, H]. Returns (ys [T, B, H], (h_T, c_T)). Gate order matches
    torch (i, f, g, o), like nn/lstm.py.
    """
    T, B, H4 = x_proj.shape
    H = H4 // 4
    dtype = x_proj.dtype

    # Tile the batch so VMEM holds (x_proj block + w_hh + carries + double
    # buffering) at any stream count; the carry scratch persists across the
    # minor (time) grid dimension and resets at t == 0 per batch tile.
    tile_b = B if B <= 512 else 512
    while B % tile_b:
        tile_b //= 2

    ys, h_t, c_t = pl.pallas_call(
        _lstm_step_kernel,
        grid=(B // tile_b, T),
        in_specs=[
            pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((tile_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, h0, c0)
    return ys, (h_t, c_t)


def _masked_step_kernel(x_ref, w_ref, h0_ref, c0_ref, m_ref,
                        ys_ref, h_out_ref, c_out_ref,
                        h_scratch, c_scratch):
    """_lstm_step_kernel + variable-length masking with the exact
    _lstm_scan semantics: masked steps hold the carry and emit zeros, so
    the final carry equals the state at each sequence's last valid frame."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)
        c_scratch[:] = c0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    c = c_scratch[:]
    gates = x_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(x_ref.dtype), w_ref[:],
        preferred_element_type=jnp.float32)
    h_new, c_new = _cell_math(gates, c)

    m = m_ref[0, 0].astype(jnp.float32)[:, None]
    h_keep = m * h_new + (1.0 - m) * h
    c_keep = m * c_new + (1.0 - m) * c
    h_scratch[:] = h_keep
    c_scratch[:] = c_keep
    ys_ref[0] = (m * h_new).astype(ys_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        h_out_ref[:] = h_keep.astype(h_out_ref.dtype)
        c_out_ref[:] = c_keep.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_masked_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                             h0: jnp.ndarray, c0: jnp.ndarray,
                             mask: jnp.ndarray, interpret: bool = False):
    """Fused LSTM layer scan with variable-length masking (inference).

    mask: [T, B] 1.0 where the frame is valid. Semantics match
    nn/lstm._lstm_scan exactly. Measured 2.8x+ vs the masked XLA scan on
    eval-shaped ragged batches (B=64, T=512, v5e-1).
    """
    T, B, H4 = x_proj.shape
    H = H4 // 4
    dtype = x_proj.dtype
    tile_b = B if B <= 512 else 512
    while B % tile_b:
        tile_b //= 2

    ys, h_t, c_t = pl.pallas_call(
        _masked_step_kernel,
        grid=(B // tile_b, T),
        in_specs=[
            pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            # mask rides as [T, 1, B] so the block tiles legally
            pl.BlockSpec((1, 1, tile_b), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((tile_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, h0, c0, mask[:, None, :])
    return ys, (h_t, c_t)


def _bilstm_step_kernel(xf_ref, xb_ref, wf_ref, wb_ref,
                        h0f_ref, c0f_ref, h0b_ref, c0b_ref,
                        ysf_ref, ysb_ref,
                        hf_out, cf_out, hb_out, cb_out,
                        hf_s, cf_s, hb_s, cb_s):
    """One grid step advances BOTH directions of a bidirectional layer.

    The two cells are independent, so fusing them halves the number of
    sequential kernel iterations per layer (the streaming path is
    latency-bound on step count, not FLOPs) and lets the two recurrent
    matmuls overlap on the MXU. The backward direction consumes
    pre-reversed inputs and emits outputs to be un-reversed by the caller.
    """
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        hf_s[:] = h0f_ref[:].astype(jnp.float32)
        cf_s[:] = c0f_ref[:].astype(jnp.float32)
        hb_s[:] = h0b_ref[:].astype(jnp.float32)
        cb_s[:] = c0b_ref[:].astype(jnp.float32)

    def cell(x_ref, w_ref, h_s, c_s):
        h = h_s[:]
        gates = x_ref[0].astype(jnp.float32) + jnp.dot(
            h.astype(x_ref.dtype), w_ref[:],
            preferred_element_type=jnp.float32)
        h_new, c_new = _cell_math(gates, c_s[:])
        h_s[:] = h_new
        c_s[:] = c_new
        return h_new, c_new

    hf, cf = cell(xf_ref, wf_ref, hf_s, cf_s)
    hb, cb = cell(xb_ref, wb_ref, hb_s, cb_s)
    ysf_ref[0] = hf.astype(ysf_ref.dtype)
    ysb_ref[0] = hb.astype(ysb_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hf_out[:] = hf.astype(hf_out.dtype)
        cf_out[:] = cf.astype(cf_out.dtype)
        hb_out[:] = hb.astype(hb_out.dtype)
        cb_out[:] = cb.astype(cb_out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_layer_pallas(x_proj_f: jnp.ndarray, x_proj_b: jnp.ndarray,
                        w_hh_f: jnp.ndarray, w_hh_b: jnp.ndarray,
                        h0f, c0f, h0b, c0b, interpret: bool = False):
    """Fused bidirectional LSTM layer scan.

    x_proj_f / x_proj_b: [T, B, 4H] forward / (pre-reversed) backward input
    projections. Returns (ys_f [T,B,H], ys_b [T,B,H] (still reversed),
    (h_f, c_f), (h_b, c_b)).
    """
    T, B, H4 = x_proj_f.shape
    H = H4 // 4
    dtype = x_proj_f.dtype
    tile_b = B if B <= 256 else 256
    while B % tile_b:
        tile_b //= 2

    ts_spec = pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _bilstm_step_kernel,
        grid=(B // tile_b, T),
        in_specs=[ts_spec, ts_spec, w_spec, w_spec,
                  s_spec, s_spec, s_spec, s_spec],
        out_specs=[y_spec, y_spec, s_spec, s_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, H), jnp.float32)] * 4,
        interpret=interpret,
    )(x_proj_f, x_proj_b, w_hh_f, w_hh_b, h0f, c0f, h0b, c0b)
    ys_f, ys_b, h_f, c_f, h_b, c_b = outs
    return ys_f, ys_b, (h_f, c_f), (h_b, c_b)


# ---------------------------------------------------------------------------
# W8A8 int8 variants (ops/quant.py layout: int8 w_hh + per-column scale).
# Same scan structure as the float kernels; the recurrent matmul runs
# int8 x int8 -> int32 on the MXU (2x the bf16 rate on v5e) with the
# hidden state re-quantized per step in-kernel (int8_recurrent_gates).
# Inference-only: no VJP, training backends reject quantized params.
# ---------------------------------------------------------------------------

def _gates_int8(x_ref, w_ref, s_ref, h):
    from mobileposer_tpu.ops.quant import int8_recurrent_gates
    return (x_ref[0].astype(jnp.float32)
            + int8_recurrent_gates(h, w_ref[:], s_ref[:]))


def _masked_step_kernel_int8(x_ref, w_ref, s_ref, h0_ref, c0_ref, m_ref,
                             ys_ref, h_out_ref, c_out_ref,
                             h_scratch, c_scratch):
    """_masked_step_kernel with the recurrent matmul on the int8 MXU path."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)
        c_scratch[:] = c0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    c = c_scratch[:]
    h_new, c_new = _cell_math(_gates_int8(x_ref, w_ref, s_ref, h), c)

    m = m_ref[0, 0].astype(jnp.float32)[:, None]
    h_keep = m * h_new + (1.0 - m) * h
    c_keep = m * c_new + (1.0 - m) * c
    h_scratch[:] = h_keep
    c_scratch[:] = c_keep
    ys_ref[0] = (m * h_new).astype(ys_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        h_out_ref[:] = h_keep.astype(h_out_ref.dtype)
        c_out_ref[:] = c_keep.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_masked_pallas_int8(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                                  w_scale: jnp.ndarray,
                                  h0: jnp.ndarray, c0: jnp.ndarray,
                                  mask: jnp.ndarray,
                                  interpret: bool = False):
    """Masked LSTM layer scan with int8 w_hh [H, 4H] + scale [4H].

    Semantics match nn/lstm._lstm_scan with the quantized recurrent step;
    x_proj must already include the (pre-summed) biases."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    dtype = x_proj.dtype
    tile_b = B if B <= 512 else 512
    while B % tile_b:
        tile_b //= 2

    ys, h_t, c_t = pl.pallas_call(
        _masked_step_kernel_int8,
        grid=(B // tile_b, T),
        in_specs=[
            pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_b), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((tile_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, w_scale.reshape(1, H4), h0, c0, mask[:, None, :])
    return ys, (h_t, c_t)


def _lstm_step_kernel_int8(x_proj_ref, w_hh_ref, s_ref, h0_ref, c0_ref,
                           ys_ref, h_out_ref, c_out_ref,
                           h_scratch, c_scratch):
    """_lstm_step_kernel (full-length, unidirectional) on int8 weights."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)
        c_scratch[:] = c0_ref[:].astype(jnp.float32)

    h_new, c_new = _cell_math(
        _gates_int8(x_proj_ref, w_hh_ref, s_ref, h_scratch[:]), c_scratch[:])
    h_scratch[:] = h_new
    c_scratch[:] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        h_out_ref[:] = h_new.astype(h_out_ref.dtype)
        c_out_ref[:] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_layer_pallas_int8(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                           w_scale: jnp.ndarray,
                           h0: jnp.ndarray, c0: jnp.ndarray,
                           interpret: bool = False):
    """Full-length unidirectional LSTM layer scan, int8 w_hh [H, 4H] +
    per-column scale [4H]. Mirrors lstm_layer_pallas."""
    T, B, H4 = x_proj.shape
    H = H4 // 4
    dtype = x_proj.dtype
    tile_b = B if B <= 512 else 512
    while B % tile_b:
        tile_b //= 2

    ys, h_t, c_t = pl.pallas_call(
        _lstm_step_kernel_int8,
        grid=(B // tile_b, T),
        in_specs=[
            pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, H), jnp.float32),
            pltpu.VMEM((tile_b, H), jnp.float32),
        ],
        interpret=interpret,
    )(x_proj, w_hh, w_scale.reshape(1, H4), h0, c0)
    return ys, (h_t, c_t)


def _bilstm_step_kernel_int8(xf_ref, xb_ref, wf_ref, wb_ref,
                             sf_ref, sb_ref,
                             h0f_ref, c0f_ref, h0b_ref, c0b_ref,
                             ysf_ref, ysb_ref,
                             hf_out, cf_out, hb_out, cb_out,
                             hf_s, cf_s, hb_s, cb_s):
    """_bilstm_step_kernel with both recurrent matmuls on the int8 MXU
    path (the two directions' dots can still overlap)."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        hf_s[:] = h0f_ref[:].astype(jnp.float32)
        cf_s[:] = c0f_ref[:].astype(jnp.float32)
        hb_s[:] = h0b_ref[:].astype(jnp.float32)
        cb_s[:] = c0b_ref[:].astype(jnp.float32)

    def cell(x_ref, w_ref, s_ref, h_s, c_s):
        h_new, c_new = _cell_math(
            _gates_int8(x_ref, w_ref, s_ref, h_s[:]), c_s[:])
        h_s[:] = h_new
        c_s[:] = c_new
        return h_new, c_new

    hf, cf = cell(xf_ref, wf_ref, sf_ref, hf_s, cf_s)
    hb, cb = cell(xb_ref, wb_ref, sb_ref, hb_s, cb_s)
    ysf_ref[0] = hf.astype(ysf_ref.dtype)
    ysb_ref[0] = hb.astype(ysb_ref.dtype)

    @pl.when(t == T - 1)
    def _():
        hf_out[:] = hf.astype(hf_out.dtype)
        cf_out[:] = cf.astype(cf_out.dtype)
        hb_out[:] = hb.astype(hb_out.dtype)
        cb_out[:] = cb.astype(cb_out.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_layer_pallas_int8(x_proj_f: jnp.ndarray, x_proj_b: jnp.ndarray,
                             w_hh_f: jnp.ndarray, w_hh_b: jnp.ndarray,
                             w_scale_f: jnp.ndarray, w_scale_b: jnp.ndarray,
                             h0f, c0f, h0b, c0b, interpret: bool = False):
    """Fused bidirectional LSTM layer scan, int8 recurrent weights.

    Mirrors bilstm_layer_pallas with w_hh int8 [H, 4H] + scales [4H]."""
    T, B, H4 = x_proj_f.shape
    H = H4 // 4
    dtype = x_proj_f.dtype
    tile_b = B if B <= 256 else 256
    while B % tile_b:
        tile_b //= 2

    ts_spec = pl.BlockSpec((1, tile_b, H4), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                          memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                           memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _bilstm_step_kernel_int8,
        grid=(B // tile_b, T),
        in_specs=[ts_spec, ts_spec, w_spec, w_spec, sc_spec, sc_spec,
                  s_spec, s_spec, s_spec, s_spec],
        out_specs=[y_spec, y_spec, s_spec, s_spec, s_spec, s_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, H), jnp.float32)] * 4,
        interpret=interpret,
    )(x_proj_f, x_proj_b, w_hh_f, w_hh_b,
      w_scale_f.reshape(1, H4), w_scale_b.reshape(1, H4),
      h0f, c0f, h0b, c0b)
    ys_f, ys_b, h_f, c_f, h_b, c_b = outs
    return ys_f, ys_b, (h_f, c_f), (h_b, c_b)


def _project_timesteps(xs, p, dtype):
    """Input projection over all timesteps, float or W8A8 (ops/quant.py
    layout — int8 w_ih + per-column scale, pre-summed bias)."""
    if jnp.dtype(p["w_ih"].dtype) == jnp.int8:
        from mobileposer_tpu.ops.quant import int8_matmul
        return (int8_matmul(xs, p["w_ih"], p["w_ih_scale"])
                + p["b"]).astype(dtype)
    return xs @ p["w_ih"] + (p["b_ih"] + p["b_hh"])


def lstm_forward_pallas(params_layers, x: jnp.ndarray,
                        h0c0=None, bidirectional: bool = True,
                        interpret: bool = False, time_major: bool = False):
    """Multi-layer (bi)LSTM on the pallas kernel — full-length sequences
    (no masking; the XLA path in nn/lstm.py handles ragged batches).

    Mirrors `nn.lstm.lstm_forward` for lengths=None. Accepts W8A8
    quantized layers (ops/quant.py): input projections run on the int8
    MXU path and the scans dispatch to the `*_int8` kernels.
    """
    if time_major:
        T, B, _ = x.shape
    else:
        B, T, _ = x.shape
    n_dir = 2 if bidirectional else 1
    n_layers = len(params_layers)
    H = params_layers[0]["fwd"]["w_hh"].shape[0]
    dtype = x.dtype

    if h0c0 is None:
        zeros = jnp.zeros((n_layers * n_dir, B, H), dtype)
        h0_all, c0_all = zeros, zeros
    else:
        h0_all, c0_all = h0c0

    xs = x if time_major else jnp.swapaxes(x, 0, 1)     # [T, B, D]
    h_finals, c_finals = [], []
    for li, layer in enumerate(params_layers):
        quantized = jnp.dtype(layer["fwd"]["w_ih"].dtype) == jnp.int8
        if bidirectional:
            pf, pb = layer["fwd"], layer["bwd"]
            x_proj_f = _project_timesteps(xs, pf, dtype)
            x_proj_b = _project_timesteps(xs[::-1], pb, dtype)
            s = li * 2
            if quantized:
                ys_f, ys_b, (hf, cf), (hb, cb) = bilstm_layer_pallas_int8(
                    x_proj_f, x_proj_b, pf["w_hh"], pb["w_hh"],
                    pf["w_hh_scale"], pb["w_hh_scale"],
                    h0_all[s], c0_all[s], h0_all[s + 1], c0_all[s + 1],
                    interpret=interpret)
            else:
                ys_f, ys_b, (hf, cf), (hb, cb) = bilstm_layer_pallas(
                    x_proj_f, x_proj_b, pf["w_hh"], pb["w_hh"],
                    h0_all[s], c0_all[s], h0_all[s + 1], c0_all[s + 1],
                    interpret=interpret)
            xs = jnp.concatenate([ys_f, ys_b[::-1]], axis=-1)
            h_finals += [hf, hb]
            c_finals += [cf, cb]
        else:
            p = layer["fwd"]
            x_proj = _project_timesteps(xs, p, dtype)
            if quantized:
                ys, (h_t, c_t) = lstm_layer_pallas_int8(
                    x_proj, p["w_hh"], p["w_hh_scale"],
                    h0_all[li], c0_all[li], interpret=interpret)
            else:
                ys, (h_t, c_t) = lstm_layer_pallas(
                    x_proj, p["w_hh"], h0_all[li], c0_all[li],
                    interpret=interpret)
            xs = ys
            h_finals.append(h_t)
            c_finals.append(c_t)
    y = xs if time_major else jnp.swapaxes(xs, 0, 1)
    return y, (jnp.stack(h_finals), jnp.stack(c_finals))


def rnn_apply_pallas(params: dict, cfg, x: jnp.ndarray, h0c0=None,
                     interpret: bool = False):
    """Pallas-backed equivalent of `nn.lstm.rnn_apply` (inference path:
    full-length, no dropout)."""
    hidden = jax.nn.relu(x @ params["linear1"]["w"] + params["linear1"]["b"])
    y, hc = lstm_forward_pallas(params["lstm"], hidden, h0c0,
                                bidirectional=cfg.bidirectional,
                                interpret=interpret)
    y = y @ params["linear2"]["w"] + params["linear2"]["b"]
    return y, hc
