"""Int8 (W8A8) quantized inference for the serving paths (carry + exact).

TPU MXUs execute int8 x int8 -> int32 matmuls at twice the bf16 rate
(v5e: 394 int8 TOPS vs 197 bf16 TFLOPS), and both streaming modes are
compute-bound at high stream counts (exact ~68%, carry ~90% of bf16 peak
on v5e-1, benchmarks/report_v5e1.json). Quantizing the LSTM matmuls —
which carry essentially all of the step FLOPs — is therefore the one
remaining ~2x compute lever on this hardware. The reference has no
quantized path; this is an extension beyond parity, opt-in like carry
mode itself, and it must always ship with a measured accuracy label
(scripts/carry_ab.py --int8 / tests/test_quant.py).

Scheme — standard dynamic-activation symmetric W8A8:

  * WEIGHTS: per-output-column symmetric int8 (`scale_j = amax|w[:, j]|
    / 127`), quantized once on the host in numpy (no eager device ops —
    CLAUDE.md tunnel rule). Biases stay float.
  * ACTIVATIONS: per-row dynamic symmetric int8 computed inside jit each
    step (`scale_b = amax|x[b, :]| / 127`). LSTM hidden states are
    bounded in (-1, 1) and relu'd projections are well-scaled, so
    dynamic per-row quant loses ~log2(127) ~ 7 bits of mantissa — the
    measured metric deltas on the trained fixture stay fractions of the
    carry-vs-exact gap (tests/test_quant.py bounds them in CI).
  * MATMUL: int8 x int8 accumulated in int32 on the MXU
    (`lax.dot_general(..., preferred_element_type=int32)`), dequantized
    by the outer product of the two scales, biases added in float.

Only LSTM kernel matmuls are quantized. linear1/linear2 are a rounding
error of the FLOPs (<3%) and the output head's precision matters most,
so they run in the float dtype of the incoming activations.

Quantized direction dicts keep the key "w_ih"/"w_hh" with int8 dtype and
EVERY inference path dispatches on that dtype:

  * carry mode — `nn.lstm.lstm_cell_step` routes to the int8 cell, so the
    whole carry stack (models/streaming.py) runs unchanged;
  * exact/windowed mode — `nn.lstm.lstm_forward` computes the bulk input
    projections with `int8_matmul` and runs the recurrent scans either as
    an int8 XLA scan or through the int8 Pallas kernels
    (ops/lstm_pallas.py `*_int8`), which re-quantize the hidden state
    per step inside the kernel via `int8_recurrent_gates`.

Training backends reject quantized params (jnp.round has no gradient;
quantization is a post-training serving transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Symmetric int8 range. 127 (not 128) keeps the grid symmetric so that
# quantize(-x) == -quantize(x) and the int32 accumulator can never see
# the -128 * -128 corner.
_QMAX = 127.0


# ---------------------------------------------------------------------------
# Host-side weight quantization (numpy: runs once, off-device)
# ---------------------------------------------------------------------------

def quantize_weight_int8(w) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-column symmetric int8. w [D, N] -> (q int8 [D, N],
    scale f32 [N]) with w ~= q * scale."""
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / _QMAX
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.rint(w / scale), -_QMAX, _QMAX).astype(np.int8)
    return q, scale


def quantize_lstm_direction(p: dict) -> dict:
    """One direction of one layer (init_lstm_layer layout) -> quantized
    layout consumed by lstm_cell_step_int8. Biases are pre-summed (the
    float cell adds b_ih + b_hh every step; reference rnn.py keeps them
    separate only because torch does)."""
    w_ih_q, s_ih = quantize_weight_int8(p["w_ih"])
    w_hh_q, s_hh = quantize_weight_int8(p["w_hh"])
    b = (np.asarray(p["b_ih"], np.float32)
         + np.asarray(p["b_hh"], np.float32))
    return {"w_ih": w_ih_q, "w_ih_scale": s_ih,
            "w_hh": w_hh_q, "w_hh_scale": s_hh, "b": b}


def quantize_params_int8(params: dict) -> dict:
    """Quantize every LSTM direction of a net/module params pytree,
    leaving linears (and anything non-LSTM) untouched.

    Accepts either a single module dict ({"linear1", "linear2", "lstm"})
    or the full net dict ({"joints": module, "poser": module, ...})."""
    # ONE batched fetch if the tree lives on a device: per-leaf np.asarray
    # pays a transport round trip PER LEAF over tunneled hosts (CLAUDE.md)
    params = jax.device_get(params)

    def rec(tree: dict):
        if "lstm" in tree:  # a module dict
            out = dict(tree)
            out["lstm"] = [
                {d: quantize_lstm_direction(layer[d]) for d in layer}
                for layer in tree["lstm"]
            ]
            return out, 1
        out, n = {}, 0
        for name, v in tree.items():
            if isinstance(v, dict):
                out[name], k = rec(v)
                n += k
            else:
                out[name] = v
        return out, n

    out, n_stacks = rec(params)
    if n_stacks == 0:
        raise ValueError(
            "quantize_params_int8: no LSTM stack found anywhere in the "
            "params tree — a layout change would otherwise yield a "
            "'quantized' tree that still runs float matmuls")
    # Return DEVICE-resident arrays (one batched placement): every
    # in-repo consumer runs inference right after, and a numpy tree
    # passed to a jitted step re-uploads EVERY leaf on EVERY call — over
    # a tunneled host that per-leaf transfer storm measured as a 10-20x
    # serving "slowdown" wrongly attributed to int8 compute (r5 SLO runs;
    # scripts/int8_microbench.py caught it). Export flows np.asarray the
    # leaves anyway, which works on device arrays.
    return jax.device_put(out)


def is_quantized(p: dict) -> bool:
    """True if a direction dict holds int8 kernels."""
    return jnp.dtype(p["w_ih"].dtype) == jnp.int8


# ---------------------------------------------------------------------------
# In-jit dynamic activation quantization + int8 matmul
# ---------------------------------------------------------------------------

def dynamic_quantize(x: jnp.ndarray):
    """Per-row symmetric int8: x [..., D] -> (q int8, scale f32 [..., 1])."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / _QMAX
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                w_scale: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-quantized x [..., D] @ int8 w_q [D, N] -> f32 [..., N].

    The contraction runs int8 x int8 -> int32 on the MXU; the float
    dequant is a rank-1 outer product of the row and column scales."""
    x_q, x_scale = dynamic_quantize(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * w_scale)


def int8_recurrent_gates(h: jnp.ndarray, w_q: jnp.ndarray,
                         w_scale: jnp.ndarray) -> jnp.ndarray:
    """Quantized recurrent gate contribution: h [B, H] @ int8 w_q [H, 4H]
    -> f32 [B, 4H], re-quantizing h per row each call.

    THE single implementation of the per-step int8 recurrent matmul: the
    XLA scan path (nn/lstm._lstm_scan with a w_hh_scale) and the int8
    Pallas kernels (ops/lstm_pallas.py) both call it, so their numerics
    agree to float rounding (the int8 x int8 -> int32 contraction itself
    is exact). Uses plain jnp.dot — 2D operands only — which lowers on
    the MXU's native int8 path inside Mosaic kernels. w_scale may be
    [4H] or [1, 4H] (kernel refs carry a leading block dim)."""
    h_q, h_scale = dynamic_quantize(h)
    acc = jnp.dot(h_q, w_q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (h_scale * w_scale.reshape(1, -1))


def lstm_cell_step_int8(p: dict, x: jnp.ndarray, h: jnp.ndarray,
                        c: jnp.ndarray):
    """One LSTM step on a quantized direction dict. Same contract as
    nn.lstm.lstm_cell_step (which dispatches here on int8 kernels):
    x [B, D], h/c [B, H] in any float dtype; returns (h', c') in that
    dtype. Gates dequantize to f32 and are cast to the carry dtype
    BEFORE the nonlinearity so scan carries keep a stable dtype."""
    from mobileposer_tpu.nn.lstm import _gate_update
    gates = (int8_matmul(x, p["w_ih"], p["w_ih_scale"])
             + int8_matmul(h, p["w_hh"], p["w_hh_scale"])
             + p["b"]).astype(h.dtype)
    return _gate_update(gates, c)
