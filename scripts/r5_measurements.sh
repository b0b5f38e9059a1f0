#!/bin/bash
# Round-5 follow-up measurements on the real chip (after r4_measurements.sh):
# rerun the pipelined serving legs with the async-copy fetcher fix, measure
# the single-user live loop, and dissect the int8 serving slowdown.
#     bash scripts/r5_measurements.sh [report.json]
set -u
cd "$(dirname "$0")/.."
REPORT="${1:-benchmarks/report_v5e1.json}"
LOG=/tmp/r5_measurements.log
echo "=== r5 measurements -> $REPORT ($(date))" | tee -a "$LOG"

run() {
    echo "--- $* ($(date +%H:%M:%S))" | tee -a "$LOG"
    timeout 3000 "$@" 2>&1 | tail -20 | tee -a "$LOG"
    local rc=${PIPESTATUS[0]}
    echo "--- rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG"
}

# 1. Serving SLO reruns: the async-copy fetcher (copy_to_host_async at
# dispatch) replaces the per-tick fetch RTT with overlapped transfers —
# the r4-coded legs measured fetch p50 47.6 ms / sustained 25.6 Hz
run python scripts/serving_slo.py --streams 256 --seconds 20 --out "$REPORT"
run python scripts/serving_slo.py --streams 256 --seconds 20 --mode carry --out "$REPORT"

# 2. Single-user live demo loop (reference live_demo.py:207-264 semantics)
run python scripts/live_loop_slo.py --seconds 15 --out "$REPORT"
run python scripts/live_loop_slo.py --seconds 15 --sync --out "$REPORT"

# 3. int8 serving dissection (r5 postmortem: the initial 10-20x "slowdown"
# was a host-transfer storm from numpy quantized params, since fixed;
# measured outcome is parity — see the int8_microbench report row)
run python scripts/int8_microbench.py --streams 256 --frames 64 --out "$REPORT"

echo "=== done ($(date))" | tee -a "$LOG"
