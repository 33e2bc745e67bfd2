#!/bin/bash
# Round-4 frontier walk: pooled tick budgets over long async-MC windows
# (the completion-indexed candidate stream made fused_mc_steps > 16
# VMEM-feasible).  One config per process (Pallas programs do not fully
# ride the compile cache across configs; a multi-config process blows
# the per-run ceiling).  10gs, 16 lig x 8 chains = 128 lanes, 1024 MC
# steps/chain, seed 1 warm + seed 2 timed (tpu_inkernel_ab.py).
#
# Usage: bash scripts/tpu_r4_sweep.sh [out.jsonl]
set -u
OUT=${1:-/tmp/r4_sweep.jsonl}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ===" >&2
  env "$@" AB_MODE=ink AB_ASYNC_MC=1 timeout 1800 \
      python scripts/tpu_inkernel_ab.py | tee -a "$OUT"
}
: > "$OUT"
# baseline: round-3 default (10x2, budget 32, S=16) on the new stream
run AB_TRIALS=10 AB_FACTOR=2 AB_TICKS=32 AB_MC_STEPS=16
# r3 sweep's fastest point, now gate-certifiable (5x4, budget 16, S=16)
run AB_TRIALS=5 AB_FACTOR=4 AB_TICKS=16 AB_MC_STEPS=16
# pooled windows: same per-step budget, 4x longer window
run AB_TRIALS=10 AB_FACTOR=2 AB_TICKS=16 AB_MC_STEPS=64
run AB_TRIALS=5 AB_FACTOR=4 AB_TICKS=16 AB_MC_STEPS=64
run AB_TRIALS=5 AB_FACTOR=4 AB_TICKS=12 AB_MC_STEPS=64
run AB_TRIALS=5 AB_FACTOR=4 AB_TICKS=8 AB_MC_STEPS=64
echo "sweep done -> $OUT" >&2
