#!/bin/bash
# TPU measurement battery for BASELINE.md M8: waits for the axon relay to
# come back, then runs each bench mode SEQUENTIALLY (never two TPU processes
# at once) with per-step timeouts, appending JSON lines to TPU_MEASURE_r02.log.
# Usage: bash scripts/tpu_measure.sh [max_wait_minutes]
set -u
cd "$(dirname "$0")/.."
LOG=TPU_MEASURE_r02.log
MAX_WAIT_MIN=${1:-600}

probe() { timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; }

waited=0
until probe; do
  sleep 300
  waited=$((waited + 5))
  if [ "$waited" -ge "$MAX_WAIT_MIN" ]; then
    echo "{\"tpu_watcher\": \"gave up after ${waited} min\"}" >> "$LOG"
    exit 1
  fi
done
echo "{\"tpu_watcher\": \"relay up after ${waited} min, starting battery\"}" >> "$LOG"

run() {  # run <label> <timeout_s> <env...>
  local label=$1 tmo=$2; shift 2
  echo "{\"battery_step\": \"$label\"}" >> "$LOG"
  timeout "$tmo" env "$@" python bench.py >> "$LOG" 2>&1
  echo "" >> "$LOG"
}

# 1) headline: converged-solves/s, Pallas on (default)
run headline_pallas 5400 BENCH_REPS=2
# 2) headline without Pallas (isolates the kernel win)
run headline_xla 5400 BENCH_USE_PALLAS=0 BENCH_REPS=2
# 3) per-stage SoL table
run sol 5400 BENCH_MODE=sol
# 4) replanning latency
run replan 3600 BENCH_MODE=replan
echo "{\"tpu_watcher\": \"battery complete\"}" >> "$LOG"
