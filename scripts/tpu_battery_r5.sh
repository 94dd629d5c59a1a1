#!/bin/bash
# Round-5 measurement battery: headline + amortized-seeded + SoL + replan from
# the SAME build, one script run (VERDICT r4 item 4 — the r4 battery was
# committed but never executed; this one writes to a COMMITTED log path and
# records rc per step, per ADVICE r4). Sequential: the host has 4 cores and
# every step's XLA compile wants all of them.
set -u
cd "$(dirname "$0")/.."
LOG=${BATTERY_LOG:-logs/TPU_BATTERY_r05.log}
: > "$LOG"
# Per-step timeout ABOVE the measured cold-compile wall (~15 min for the
# no-unroll tree; ADVICE r4: the r4 script's 2400 s was below the then-44-min
# wall and a timeout looked like an empty success).
STEP_T=${STEP_TIMEOUT:-3300}

run() {
  local label=$1; shift
  echo "{\"step\": \"$label\", \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
  env "$@" timeout "$STEP_T" python -u bench.py >> "$LOG" 2>&1
  echo "{\"step_rc\": $?, \"t\": \"$(date -u +%H:%M:%S)\"}" >> "$LOG"
}

# headline: cold dispersed sweep, shipped defaults, regression-gated
run headline          BENCH_GATE=1
# production Monte-Carlo mode: one cold nominal solve seeds every dispersed
# lane; the nominal is solved outside the timed reps (amortized, SURVEY §3.4)
run seeded            BENCH_MODE=seeded
# per-stage speed-of-light accounting for the current build
run sol               BENCH_MODE=sol
# replanning latency (PCR backend is the replan default)
run replan            BENCH_MODE=replan
echo "{\"battery_done\": true}" >> "$LOG"
