#!/bin/bash
# Round-3 line-search/MC-structure sweep (ONE config per process, strictly
# serial — see ROADMAP "Round-3 perf measurements" and the verify skill's
# pool-wedge guidance).  Appends one JSON line per config to the log.
# Usage: bash scripts/tpu_r3_sweep.sh [logfile]
set -u
LOG=${1:-/tmp/ab_sweep.jsonl}
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label $(date -u +%H:%M:%S) ===" >> "$LOG"
  env "$@" timeout 880 python scripts/tpu_inkernel_ab.py >> "$LOG" 2>/tmp/ab_last.err
  local rc=$?
  [ $rc -ne 0 ] && echo "{\"label\": \"$label\", \"rc\": $rc}" >> "$LOG"
  sleep 10
}

run lockstep_5x4   AB_MODE=ink AB_TRIALS=5 AB_FACTOR=4
run async_ls_5x4   AB_MODE=ink AB_TRIALS=5 AB_FACTOR=4 AB_ASYNC=1
run async_mc_b24   AB_MODE=ink AB_TRIALS=5 AB_FACTOR=4 AB_ASYNC_MC=1 AB_TICKS=24
run async_mc_b16   AB_MODE=ink AB_TRIALS=5 AB_FACTOR=4 AB_ASYNC_MC=1 AB_TICKS=16

# refresh the recorded fused-vs-XLA quality gate (PATH_PARITY.json is
# embedded in bench output; it must reflect the current kernel)
echo "=== path_parity $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 880 python scripts/tpu_path_parity.py >> "$LOG" 2>>/tmp/ab_last.err
echo "=== sweep done $(date -u +%H:%M:%S) ===" >> "$LOG"
