"""Pallas kernel: advance several independent LSTM cells in one scan.

Motivation: the streaming hot path is latency-bound on the NUMBER of
sequential scan iterations, not FLOPs (CLAUDE.md). After the joints module,
the poser / footcontact / velocity modules all consume the same 132-dim
input, so their per-layer cells are mutually independent — e.g. layer 1 of
the trio is five cells (poser fwd/bwd H=256, footcontact fwd/bwd H=64,
velocity H=256). Running them as five scans costs 5 x T sequential
iterations; this kernel runs all five cells inside ONE grid step (separate
small matmuls per cell — a block-diagonal matmul would waste 4-5x FLOPs),
cutting the iteration count to T.

Backward-direction cells consume pre-reversed inputs and emit outputs the
caller un-reverses — the same convention as ops/lstm_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(hidden_sizes: Tuple[int, ...]):
    n_cells = len(hidden_sizes)
    offs4 = [0]
    for h in hidden_sizes:
        offs4.append(offs4[-1] + 4 * h)

    def kernel(*refs):
        # refs: x_proj, w_hh x n, h0 x n, c0 x n | ys x n, h_out x n,
        #       c_out x n | scratch (h x n, c x n)
        x_ref = refs[0]
        w_refs = refs[1:1 + n_cells]
        h0_refs = refs[1 + n_cells:1 + 2 * n_cells]
        c0_refs = refs[1 + 2 * n_cells:1 + 3 * n_cells]
        out_base = 1 + 3 * n_cells
        ys_refs = refs[out_base:out_base + n_cells]
        hout_refs = refs[out_base + n_cells:out_base + 2 * n_cells]
        cout_refs = refs[out_base + 2 * n_cells:out_base + 3 * n_cells]
        scratch = refs[out_base + 3 * n_cells:]
        h_s = scratch[:n_cells]
        c_s = scratch[n_cells:]

        t = pl.program_id(1)
        T = pl.num_programs(1)

        @pl.when(t == 0)
        def _():
            for i in range(n_cells):
                h_s[i][:] = h0_refs[i][:].astype(jnp.float32)
                c_s[i][:] = c0_refs[i][:].astype(jnp.float32)

        for i, H in enumerate(hidden_sizes):
            h = h_s[i][:]
            c = c_s[i][:]
            xp = x_ref[0, :, offs4[i]:offs4[i + 1]].astype(jnp.float32)
            gates = xp + jnp.dot(h.astype(w_refs[i].dtype), w_refs[i][:],
                                 preferred_element_type=jnp.float32)
            ig = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
            fg = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            og = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
            c_new = fg * c + ig * gg
            h_new = og * jnp.tanh(c_new)
            h_s[i][:] = h_new
            c_s[i][:] = c_new
            ys_refs[i][0] = h_new.astype(ys_refs[i].dtype)

            @pl.when(t == T - 1)
            def _(i=i, h_new=h_new, c_new=c_new):
                hout_refs[i][:] = h_new.astype(hout_refs[i].dtype)
                cout_refs[i][:] = c_new.astype(cout_refs[i].dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("hidden_sizes", "interpret"))
def multicell_lstm_pallas(x_proj: jnp.ndarray, w_hhs: Tuple[jnp.ndarray, ...],
                          h0s: Tuple[jnp.ndarray, ...],
                          c0s: Tuple[jnp.ndarray, ...],
                          hidden_sizes: Tuple[int, ...],
                          interpret: bool = False):
    """Run `len(hidden_sizes)` independent LSTM cells in one scan.

    x_proj: [T, B, sum(4*H_i)] — per-cell input projections (incl. biases)
        concatenated along features, backward cells pre-reversed in time.
    w_hhs/h0s/c0s: per-cell recurrent weights [H_i, 4H_i] and carries [B, H_i].

    Returns (ys tuple of [T, B, H_i], h_ts, c_ts).
    """
    T, B, _ = x_proj.shape
    dtype = x_proj.dtype
    n = len(hidden_sizes)
    tile_b = B if B <= 256 else 256
    while B % tile_b:
        tile_b //= 2

    x_spec = pl.BlockSpec((1, tile_b, x_proj.shape[2]),
                          lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM) for H in hidden_sizes]
    s_specs = [pl.BlockSpec((tile_b, H), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM) for H in hidden_sizes]
    y_specs = [pl.BlockSpec((1, tile_b, H), lambda b, t: (t, b, 0),
                            memory_space=pltpu.VMEM) for H in hidden_sizes]

    outs = pl.pallas_call(
        _make_kernel(tuple(hidden_sizes)),
        grid=(B // tile_b, T),
        in_specs=[x_spec] + w_specs + s_specs + s_specs,
        out_specs=y_specs + s_specs + s_specs,
        out_shape=(
            [jax.ShapeDtypeStruct((T, B, H), dtype) for H in hidden_sizes]
            + [jax.ShapeDtypeStruct((B, H), dtype) for H in hidden_sizes] * 2),
        scratch_shapes=[pltpu.VMEM((tile_b, H), jnp.float32)
                        for H in hidden_sizes] * 2,
        interpret=interpret,
    )(x_proj, *w_hhs, *h0s, *c0s)
    ys = tuple(outs[:n])
    h_ts = tuple(outs[n:2 * n])
    c_ts = tuple(outs[2 * n:3 * n])
    return ys, h_ts, c_ts
