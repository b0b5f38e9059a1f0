"""Fused multi-module inference path.

After the joints module, the poser / footcontact / velocity modules all
consume the same 132-dim input; their LSTM cells per layer-row are mutually
independent. The standard path runs them as 10 sequential scans (2 fused-bi
+ 1 uni per row x 2 rows); here each row is ONE multicell kernel
(ops/multicell_pallas.py) advancing all five cells per step.

Measured reality check (v5e, B=256, T=45): standalone, one multicell scan
is 2.3x faster than five separate scans (0.77 vs 1.73 ms); but in the full
composite — where projections, the joints module, IK and output
materialization dominate — it is within noise of the default path, and
inside the streaming frame-scan it LOSES 2x (the concatenated projections
materialize per frame instead of fusing into XLA's pipelined scans). It
therefore stays opt-in (backend='fused') rather than part of 'auto'.

Numerically bit-identical to the per-module path (test-pinned on CPU and
verified on TPU); inference only (full-length windows, no dropout).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mobileposer_tpu.ops.multicell_pallas import multicell_lstm_pallas

# cell order within each row: poser-fwd, poser-bwd, fc-fwd, fc-bwd, velocity
_ROW_H = (256, 256, 64, 64, 256)


def _linear(x, p):
    return x @ p["w"] + p["b"]


def _row_projections(inputs, layer_params) -> jnp.ndarray:
    """Concatenate the five cells' input projections [T, B, sum 4H].

    inputs / layer_params follow the cell order above; backward cells get
    time-reversed inputs (their outputs are un-reversed by the caller).
    """
    projs = []
    for (x, reverse), p in zip(inputs, layer_params):
        xi = x[::-1] if reverse else x
        projs.append(xi @ p["w_ih"] + (p["b_ih"] + p["b_hh"]))
    return jnp.concatenate(projs, axis=-1)


def trio_apply(params: dict, x132_tm: jnp.ndarray,
               vel_h0c0: Tuple[jnp.ndarray, jnp.ndarray],
               interpret: bool = False):
    """Poser + FootContact + Velocity in two multicell scans.

    x132_tm: [T, B, 132] time-major. Returns (poser_r6d [T,B,96],
    contact [T,B,2], vel [T,B,72], vel_hc) — matching three
    `module_apply(..., time_major=True)` calls.
    """
    pp, pf, pv = params["poser"], params["footcontact"], params["velocity"]
    from mobileposer_tpu.ops.quant import is_quantized
    if any(is_quantized(m["lstm"][0]["fwd"]) for m in (pp, pf, pv)):
        # quantized direction dicts pre-sum b_ih+b_hh into 'b' and hold
        # int8 kernels — the multicell row projections below would die
        # with an opaque KeyError; route int8 through backend='auto'
        # (ops/lstm_pallas *_int8) or carry mode instead
        raise ValueError(
            "backend='fused' (trio_apply) does not support int8-quantized "
            "params; use backend='auto' exact serving or carry mode")
    T, B, _ = x132_tm.shape
    zeros = lambda h: jnp.zeros((B, h), x132_tm.dtype)

    hidden_p = jax.nn.relu(_linear(x132_tm, pp["linear1"]))
    hidden_f = jax.nn.relu(_linear(x132_tm, pf["linear1"]))
    hidden_v = jax.nn.relu(_linear(x132_tm, pv["linear1"]))

    # ---- row 1: layer 0 of all three modules ----
    row1_inputs = [(hidden_p, False), (hidden_p, True),
                   (hidden_f, False), (hidden_f, True),
                   (hidden_v, False)]
    row1_layers = [pp["lstm"][0]["fwd"], pp["lstm"][0]["bwd"],
                   pf["lstm"][0]["fwd"], pf["lstm"][0]["bwd"],
                   pv["lstm"][0]["fwd"]]
    x_cat = _row_projections(row1_inputs, row1_layers)
    h0s = (zeros(256), zeros(256), zeros(64), zeros(64), vel_h0c0[0][0])
    c0s = (zeros(256), zeros(256), zeros(64), zeros(64), vel_h0c0[1][0])
    ys, hts, cts = multicell_lstm_pallas(
        x_cat, tuple(l["w_hh"] for l in row1_layers), h0s, c0s, _ROW_H,
        interpret=interpret)
    poser_l1 = jnp.concatenate([ys[0], ys[1][::-1]], axis=-1)   # [T,B,512]
    fc_l1 = jnp.concatenate([ys[2], ys[3][::-1]], axis=-1)      # [T,B,128]
    vel_l1 = ys[4]
    vel_h1, vel_c1 = hts[4], cts[4]

    # ---- row 2: layer 1 of all three modules ----
    row2_inputs = [(poser_l1, False), (poser_l1, True),
                   (fc_l1, False), (fc_l1, True),
                   (vel_l1, False)]
    row2_layers = [pp["lstm"][1]["fwd"], pp["lstm"][1]["bwd"],
                   pf["lstm"][1]["fwd"], pf["lstm"][1]["bwd"],
                   pv["lstm"][1]["fwd"]]
    x_cat2 = _row_projections(row2_inputs, row2_layers)
    h0s2 = (zeros(256), zeros(256), zeros(64), zeros(64), vel_h0c0[0][1])
    c0s2 = (zeros(256), zeros(256), zeros(64), zeros(64), vel_h0c0[1][1])
    ys2, hts2, cts2 = multicell_lstm_pallas(
        x_cat2, tuple(l["w_hh"] for l in row2_layers), h0s2, c0s2, _ROW_H,
        interpret=interpret)
    poser_out = jnp.concatenate([ys2[0], ys2[1][::-1]], axis=-1)
    fc_out = jnp.concatenate([ys2[2], ys2[3][::-1]], axis=-1)
    vel_out = ys2[4]

    poser_r6d = _linear(poser_out, pp["linear2"])
    contact = _linear(fc_out, pf["linear2"])
    vel = _linear(vel_out, pv["linear2"])
    vel_hc = (jnp.stack([vel_h1, hts2[4]]), jnp.stack([vel_c1, cts2[4]]))
    return poser_r6d, contact, vel, vel_hc
