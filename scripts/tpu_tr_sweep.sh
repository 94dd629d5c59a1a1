#!/bin/bash
# Trust-region schedule sweep (VERDICT r2 item 4): the iteration breakdown
# (TPU_BATTERY_r03: 26.8 accepts / 7.6 rejects / 0.46 bumps at p50 33) says
# the budget goes to MANY SMALL ACCEPTED STEPS — attack the accept bucket
# with growth-schedule variants, measured on-chip at the shipped defaults.
set -u
cd "$(dirname "$0")/.."
LOG=${TR_LOG:-TPU_TRSWEEP_r03.log}

run() {
  local label=$1; shift
  echo "{\"tr_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout 4800 env BENCH_REPS=1 "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

run baseline
run grow3           BENCH_OVERRIDES="scvx.tr_grow=3.0"
run rho2_08         BENCH_OVERRIDES="scvx.rho2=0.8"
run grow3_rho2_08   BENCH_OVERRIDES="scvx.tr_grow=3.0,scvx.rho2=0.8"
run hold1           BENCH_OVERRIDES="scvx.tr_hold=1.0"
run tr_init2        BENCH_OVERRIDES="scvx.tr_init=2.0"
run wnu5            BENCH_OVERRIDES="scvx.w_nu=5.0"
run sigtr05         BENCH_OVERRIDES="scvx.tr_sigma_frac=0.5"
echo "{\"tr_done\": true}" >> "$LOG"
