#!/bin/bash
# Round-4 focused schedule sweep (CPU ranking; iters_p50 is hardware-
# independent). Targets the measured dominant bucket: many SMALL ACCEPTED
# steps (26.8 accepts vs 7.6 rejects per lane, docs/ARCHITECTURE.md), i.e.
# the mid-zone [rho1, rho2) hold keeps the radius small after the initial
# shrink cascade. Candidates open the growth schedule.
set -u
cd "$(dirname "$0")/.."
LOG=${TR_LOG:-TR_SWEEP_CPU_r4.log}
ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu BENCH_BATCH=64 BENCH_USE_PALLAS=0 BENCH_REPS=1 BENCH_COMPACT=0"

run() {
  local label=$1; shift
  echo "{\"tr_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout 1800 nice -n 10 $ENV "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run baseline
run rho2_07         BENCH_OVERRIDES="scvx.rho2=0.7"
run hold105         BENCH_OVERRIDES="scvx.tr_hold=1.05"
run rho2_07_hold105 BENCH_OVERRIDES="scvx.rho2=0.7,scvx.tr_hold=1.05"
run rho2_08_grow15  BENCH_OVERRIDES="scvx.rho2=0.8,scvx.tr_grow=1.5"
echo "{\"tr_done\": true}" >> "$LOG"
