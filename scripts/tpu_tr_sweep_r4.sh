#!/bin/bash
# Round-4 trust-region / schedule sweep on-chip (VERDICT r2 item 4 cont'd).
# The r3 sweep crashed after 2 steps (pallas_disc default-on bug); this one
# covers the remaining schedule variants plus the seeded-mode radius knob.
# Each step ~2-4 min with a warm compile cache.
set -u
cd "$(dirname "$0")/.."
LOG=${TR_LOG:-TPU_TRSWEEP_r04.log}

run() {
  local label=$1; shift
  echo "{\"tr_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout 2400 env BENCH_REPS=1 "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

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
