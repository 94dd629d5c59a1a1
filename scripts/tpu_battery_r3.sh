#!/bin/bash
# Round-3 follow-up battery: measures the NEW defaults (device compaction,
# equilibration off) plus the IPM micro-profile, per-stage SoL, replanning
# latency, and the PCR justify-or-retire number (VERDICT r2 items 1/3/8).
# Appends JSON lines to TPU_BATTERY_r03.log. Never two TPU processes at once.
set -u
cd "$(dirname "$0")/.."
LOG=${BAT_LOG:-TPU_BATTERY_r03.log}

run() {  # run <label> <timeout_s> <cmd...>
  local label=$1 tmo=$2; shift 2
  echo "{\"bat_step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# 1) shipped defaults: device compaction + eq off + pallas on
run headline_default 4800 env BENCH_REPS=2 python bench.py
# 2) compaction off (isolates the device-compaction win)
run nocompact 4800 env BENCH_COMPACT=0 BENCH_REPS=2 python bench.py
# 3) deeper tail buckets
run bucket32 4800 env BENCH_MIN_BUCKET=32 BENCH_REPS=1 python bench.py
# 4) 60-iteration budget at the new defaults
run budget60 4800 env BENCH_SCVX_ITERS=60 BENCH_REPS=1 python bench.py
# 5) per-stage speed-of-light table
run sol 4800 env BENCH_MODE=sol python bench.py
# 6) replanning latency, scan backend
run replan_scan 3600 env BENCH_MODE=replan python bench.py
# 7) replanning latency, PCR backend (the regime PCR was built for)
run replan_pcr 3600 env BENCH_MODE=replan BENCH_KKT=pcr python bench.py
# 8) IPM-internals micro-profile, pallas on/off
run ipm_profile_pallas 3600 env PALLAS=1 python examples/ipm_profile.py
run ipm_profile_xla 3600 env PALLAS=0 python examples/ipm_profile.py
echo "{\"bat_done\": true, \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
