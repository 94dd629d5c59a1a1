#!/bin/bash
# Round-3 on-chip A/B matrix (VERDICT r2 item 1): every perf default is set by
# TPU measurement, not CPU proxy. Runs each configuration SEQUENTIALLY (never
# two TPU processes at once), appending JSON lines to TPU_AB_r03.log.
# Usage: bash scripts/tpu_ab_r3.sh
set -u
cd "$(dirname "$0")/.."
LOG=${AB_LOG:-TPU_AB_r03.log}

run() {  # run <label> <timeout_s> <env...>
  local label=$1 tmo=$2; shift 2
  echo "{\"ab_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout "$tmo" env "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# 1) shipped r2 default (compact on, pallas on) — today's reference point
run r2_default 4800 BENCH_REPS=1
# 2) compaction OFF (VERDICT measured 7.85 vs 6.47)
run compact0 4800 BENCH_COMPACT=0 BENCH_REPS=1
# 3) compaction off + pallas off (isolate the kernel win at the new default)
run compact0_pallas0 4800 BENCH_COMPACT=0 BENCH_USE_PALLAS=0 BENCH_REPS=1
# 4) compaction off + equilibration off
run compact0_eq0 4800 BENCH_COMPACT=0 BENCH_EQUILIBRATE=0 BENCH_REPS=1
# 5) substeps=10 (the shipped DiscretizationConfig default) vs the bench's 8
run compact0_sub10 4800 BENCH_COMPACT=0 BENCH_SUBSTEPS=10 BENCH_REPS=1
# 6) 60-iteration budget (r1-era) vs 120
run compact0_budget60 4800 BENCH_COMPACT=0 BENCH_SCVX_ITERS=60 BENCH_REPS=1
echo "{\"ab_done\": true, \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
