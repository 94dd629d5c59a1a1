#!/bin/bash
# Round-5 on-chip schedule sweep (VERDICT r4 items 6+8): cut the cold p50
# iteration count (33 -> target <=22) and right-size the warm IPM cap.
# Each step is a full bench run (256 dispersed lanes, converged-solves/s) so
# ranking is by the SHIPPED metric; p50 iters is in the same JSON line.
# Writes to a COMMITTED log path and records rc per step (ADVICE r4).
# Warm cache: every step still pays one fresh compile of the overridden
# config (~4-8 min on the remote compile service).
set -u
cd "$(dirname "$0")/.."
LOG=${TR_LOG:-logs/TPU_TRSWEEP_r05.log}
: > "$LOG"

run() {
  local label=$1; shift
  echo "{\"tr_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  env "$@" timeout "${STEP_TIMEOUT:-2700}" python -u bench.py >> "$LOG" 2>&1
  echo "{\"step_rc\": $?, \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
}

# --- IPM iteration cap (item 8: ipm_iters_last_mean 6.3 vs cap 15) ---------
run ipm10            BENCH_IPM_ITERS=10
run ipm8             BENCH_IPM_ITERS=8
# --- trust-region schedule (item 6: p50 33, accept_mean 30.6 — the budget
# sink is many small accepted steps; open the growth schedule) --------------
run grow3            BENCH_OVERRIDES="scvx.tr_grow=3.0"
run rho2_08          BENCH_OVERRIDES="scvx.rho2=0.8"
run rho2_07          BENCH_OVERRIDES="scvx.rho2=0.7"
run growmid          BENCH_OVERRIDES="scvx.tr_hold=1.1"
run tr_init3         BENCH_OVERRIDES="scvx.tr_init=3.0"
run shrink03         BENCH_OVERRIDES="scvx.tr_shrink=0.3"
run filter08         BENCH_OVERRIDES="scvx.filter_gamma=0.8"
run pred1e3          BENCH_OVERRIDES="scvx.conv_tol_pred=1e-3"
echo "{\"tr_done\": true}" >> "$LOG"
