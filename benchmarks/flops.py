"""Analytic matmul-FLOP model for the MobilePoser compute paths.

Counts the MXU work (matmul multiply-adds, 2 FLOPs per MAC) of the RNN
blocks; elementwise gate math (sigmoid/tanh, VPU) and the tiny per-frame
kinematics (24 3x3 matmuls in IK/FK, ~4k FLOPs/frame) are excluded, which
is the standard model-FLOPs convention for MFU. Derived entirely from
`MODULE_CONFIGS` so architecture changes propagate.

Used by bench.py / benchmarks/run.py to turn measured wall time into
`model_flops_per_sec` and `pct_of_peak`, making the headline number
auditable: implied MFU far above ~100% of chip peak would mean the timing
harness, not the chip, produced the number.
"""

from __future__ import annotations

from mobileposer_tpu.models.modules import MODULE_CONFIGS
from mobileposer_tpu.models.net import NUM_TOTAL

# Per-chip dense peak, bf16 MACs via the MXU. JAX's default matmul
# precision on TPU feeds fp32 operands to the MXU as bf16, so this is the
# relevant ceiling for both our fp32 and bf16 paths.
TPU_PEAK_FLOPS = {
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
}
DEFAULT_PEAK = TPU_PEAK_FLOPS["v5e"]


def device_kind() -> str:
    """`jax.devices()[0].device_kind` (e.g. 'TPU v5 lite'), or the backend
    name when the attribute is absent (cpu)."""
    import jax
    d = jax.devices()[0]
    return getattr(d, "device_kind", None) or jax.default_backend()


def nominal_peak_for(kind: str | None = None) -> float:
    """Nominal bf16 dense peak for a device_kind string; DEFAULT_PEAK when
    the kind is unrecognized (reports carry the kind alongside, so an
    unmapped kind is visible rather than silently wrong)."""
    kind = (kind or device_kind()).lower()
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_PEAK_FLOPS["v5e"]
    if "v5p" in kind or "v5" in kind:
        return TPU_PEAK_FLOPS["v5p"]
    if "v6" in kind:
        return TPU_PEAK_FLOPS["v6e"]
    if "v4" in kind:
        return TPU_PEAK_FLOPS["v4"]
    return DEFAULT_PEAK


def mfu_fields(flops_per_sec: float, chip_tflops: float | None = None,
               peak: float | None = None) -> dict:
    """The standard MFU triplet for a bench row:

      pct_of_peak — vs the NOMINAL peak of the detected device kind
                    (cross-chip comparable, but the pool's chips measure
                    above/below nominal);
      pct_of_chip — vs THIS chip's measured matmul fingerprint (the honest
                    per-run utilization; the >100% honesty guard fires on
                    this one, since a fast chip day must not read as a
                    broken harness and a >nominal chip must not silently
                    exceed '100% of peak');
      honesty_flag — set when pct_of_chip > 105 (the harness, not the
                    chip, made the number).
    """
    peak = peak if peak is not None else nominal_peak_for()
    out = {"model_flops_per_sec": round(flops_per_sec),
           "pct_of_peak": round(100.0 * flops_per_sec / peak, 2)}
    if chip_tflops:
        pct_chip = 100.0 * flops_per_sec / (chip_tflops * 1e12)
        out["pct_of_chip"] = round(pct_chip, 2)
        if pct_chip > 105.0:
            out["honesty_flag"] = "model FLOPs exceed this chip's measured matmul rate"
    return out


def rnn_block_flops_per_frame(cfg) -> float:
    """Matmul FLOPs for one timestep of one stream through one RNN block:
    linear1 -> n_layers x (bi)LSTM -> linear2."""
    n_dir = 2 if cfg.bidirectional else 1
    f = 2.0 * cfg.n_input * cfg.n_hidden                      # linear1
    for layer in range(cfg.n_layers):
        n_in = cfg.n_hidden if layer == 0 else cfg.n_hidden * n_dir
        per_dir = 2.0 * (n_in * 4 * cfg.n_hidden              # x @ w_ih
                         + cfg.n_hidden * 4 * cfg.n_hidden)   # h @ w_hh
        f += n_dir * per_dir
    f += 2.0 * cfg.n_hidden * n_dir * cfg.n_output            # linear2
    return f


def forward_flops_per_frame(modules=("joints", "poser", "footcontact",
                                     "velocity")) -> float:
    """One window-frame of one stream through the chained modules."""
    return sum(rnn_block_flops_per_frame(MODULE_CONFIGS[m]) for m in modules)


def streaming_flops_per_emitted_frame(window: int = NUM_TOTAL) -> float:
    """One emitted streaming frame re-runs the full `window` through all
    four modules (reference semantics, net.py:174-178)."""
    return window * forward_flops_per_frame()


def _lstm_step_flops(n_in: int, H: int) -> float:
    return 2.0 * (n_in * 4 * H + H * 4 * H)


def carry_flops_per_emitted_frame() -> float:
    """Carry-mode streaming (models/streaming.py): per emitted frame, each
    bidirectional block runs 1 committed + (L-1) provisional forward steps
    and one L-step backward tail per layer; velocity runs one step per
    layer. L = lookahead tail (5)."""
    from mobileposer_tpu.models.net import NUM_PAST, NUM_TOTAL
    L = NUM_TOTAL - NUM_PAST
    total = 0.0
    for name in ("joints", "poser", "footcontact"):
        cfg = MODULE_CONFIGS[name]
        H = cfg.n_hidden
        joints_like = name == "joints"               # rings hold history
        total += (1 if joints_like else L) * 2.0 * cfg.n_input * H  # lin1
        total += (1 if joints_like else L) * _lstm_step_flops(H, H)  # L1 fwd
        total += L * _lstm_step_flops(H, H)          # L1 bwd tail
        total += (L if joints_like else 1) * _lstm_step_flops(2 * H, H)  # L2 fwd
        total += L * _lstm_step_flops(2 * H, H)      # L2 bwd tail
        total += (L if joints_like else 1) * 2.0 * 2 * H * cfg.n_output  # lin2
    cfg = MODULE_CONFIGS["velocity"]
    H = cfg.n_hidden
    total += 2.0 * cfg.n_input * H + _lstm_step_flops(H, H) * 2
    total += 2.0 * H * cfg.n_output
    return total


def training_flops_per_frame(module: str) -> float:
    """Fwd + bwd for one window frame of one sequence (bwd ~= 2x fwd)."""
    return 3.0 * rnn_block_flops_per_frame(MODULE_CONFIGS[module])


def mfu(flops_per_sec: float, peak: float = DEFAULT_PEAK) -> float:
    return flops_per_sec / peak


if __name__ == "__main__":
    for name, cfg in MODULE_CONFIGS.items():
        print(f"{name:12s} {rnn_block_flops_per_frame(cfg)/1e6:8.3f} MFLOP/frame")
    print(f"forward (4 modules): {forward_flops_per_frame()/1e6:.3f} MFLOP/frame")
    print(f"streaming (x{NUM_TOTAL} window): "
          f"{streaming_flops_per_emitted_frame()/1e6:.3f} MFLOP/emitted frame")
