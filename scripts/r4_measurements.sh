#!/bin/bash
# Round-4 measurement sequence on the real chip, in dependency order.
# Run from the repo root with the default (TPU) backend:
#     bash scripts/r4_measurements.sh [report.json]
# Each step merges its results into the report (benchmarks/reporting.py);
# steps are independent, so a failure skips to the next.
set -u
cd "$(dirname "$0")/.."
REPORT="${1:-benchmarks/report_v5e1.json}"
LOG=/tmp/r4_measurements.log
echo "=== r4 measurements -> $REPORT ($(date))" | tee -a "$LOG"

run() {
    echo "--- $* ($(date +%H:%M:%S))" | tee -a "$LOG"
    timeout 3000 "$@" 2>&1 | tail -20 | tee -a "$LOG"
    local rc=${PIPESTATUS[0]}
    echo "--- rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
}

# 0. int8 Mosaic-lowering smoke: gates the int8 legs below (the kernels
# are interpret-mode-pinned in CI; this proves the real TPU lowering).
# A FAILing smoke means int8 numbers would be wrong — skip those legs.
echo "--- int8 smoke ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 1200 python scripts/int8_tpu_smoke.py 2>&1 | tail -12 | tee -a "$LOG"
if [ "${PIPESTATUS[0]}" -eq 0 ]; then
    INT8_OK=1
    echo "--- int8 smoke PASS" | tee -a "$LOG"
else
    INT8_OK=0
    echo "--- int8 smoke FAIL: skipping the int8 measurement legs" | tee -a "$LOG"
fi

# 1. Serving SLO: the headline r4 item (pipelined vs sync at 256 streams)
run python scripts/serving_slo.py --streams 256 --seconds 20 --out "$REPORT"
run python scripts/serving_slo.py --streams 256 --seconds 20 --sync --out "$REPORT"
run python scripts/serving_slo.py --streams 256 --seconds 20 --mode carry --out "$REPORT"

# 1b. int8 serving legs (W8A8; ops/quant.py) — carry (pure XLA) and
# exact (int8 Pallas window kernels); gated on the step-0 smoke
if [ "$INT8_OK" -eq 1 ]; then
    run python scripts/serving_slo.py --streams 256 --seconds 20 --mode carry \
        --int8 --out "$REPORT"
    run python scripts/serving_slo.py --streams 256 --seconds 20 --mode exact \
        --int8 --out "$REPORT"
fi

# 2. Carry drift at the 10^5-frame horizon (trained fixture)
run python scripts/carry_drift.py --frames 102400 --streams 8 --report "$REPORT"

# 3. Reference-scale recipe (60 epochs + resume + finetune chain)
MP_ROOT=/tmp/recipe_scale run python scripts/recipe_scale.py --report "$REPORT"

# 3b. int8 accuracy labels on the trained fixture (carry + exact legs);
# gated on the step-0 smoke, falls back to the float A/B when gated off
if [ "$INT8_OK" -eq 1 ]; then
    run python scripts/carry_ab.py \
        --checkpoint tests/fixtures/demo_checkpoint_f16.npz \
        --int8 --report "$REPORT"
else
    run python scripts/carry_ab.py \
        --checkpoint tests/fixtures/demo_checkpoint_f16.npz --report "$REPORT"
fi

# 4. Benchmark matrix refresh (new pct_of_chip fields on every row)
run python benchmarks/run.py --out "$REPORT"

# 5. Headline bench smoke (the driver runs this again at round end)
run python bench.py

echo "=== done ($(date))" | tee -a "$LOG"
