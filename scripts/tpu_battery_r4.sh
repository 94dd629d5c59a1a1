#!/bin/bash
# Round-4 measurement battery (VERDICT r2 item 3 discipline: headline + SoL +
# replan from the SAME build, one script run). Sequential: the host has 4
# cores and every step's XLA compile wants all of them.
set -u
cd "$(dirname "$0")/.."
LOG=${BATTERY_LOG:-TPU_BATTERY_r04.log}

run() {
  local label=$1; shift
  echo "{\"step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  timeout 2400 env "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# production Monte-Carlo mode: one cold nominal solve seeds every dispersed lane
run seeded            BENCH_MODE=seeded BENCH_REPS=1
# per-stage speed-of-light accounting for the current build
run sol               BENCH_MODE=sol
# replanning latency (PCR backend is the replan default)
run replan            BENCH_MODE=replan
echo "{\"battery_done\": true}" >> "$LOG"
