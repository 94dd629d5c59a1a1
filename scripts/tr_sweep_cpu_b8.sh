#!/bin/bash
# Batch-8 CPU proxy schedule sweep: ranks trust-region/schedule variants by
# iters_p50 (hardware-independent) at ~8 min/config; winners get on-chip
# confirmation (scripts/tpu_tr_sweep_r4.sh).
set -u
cd "$(dirname "$0")/.."
LOG=${TR_LOG:-TR_SWEEP_CPU_r4.log}
: > "$LOG"
ENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu BENCH_BATCH=8 BENCH_USE_PALLAS=0 BENCH_REPS=1 BENCH_COMPACT=0"

run() {
  local label=$1; shift
  echo "{\"tr_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout 1500 $ENV "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run baseline
run rho2_08          BENCH_OVERRIDES="scvx.rho2=0.8"
run rho2_07          BENCH_OVERRIDES="scvx.rho2=0.7"
run rho2_08_grow15   BENCH_OVERRIDES="scvx.rho2=0.8,scvx.tr_grow=1.5"
run tr_init2         BENCH_OVERRIDES="scvx.tr_init=2.0"
run wnu5             BENCH_OVERRIDES="scvx.w_nu=5.0"
run sigtr05          BENCH_OVERRIDES="scvx.tr_sigma_frac=0.5"
run pred1e3          BENCH_OVERRIDES="scvx.conv_tol_pred=1e-3"
run hold095          BENCH_OVERRIDES="scvx.tr_hold=0.95"
run filter095        BENCH_OVERRIDES="scvx.filter_gamma=0.95"
echo "{\"tr_done\": true}" >> "$LOG"
