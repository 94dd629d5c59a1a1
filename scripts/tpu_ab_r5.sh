#!/bin/bash
# Round-5 on-chip A/B: RK4-unroll default flip (VERDICT r4 item 1) and the
# bounded bucket schedule (item 2). Writes to a COMMITTED log path (VERDICT
# r4 weak #7: evidence logs must be in git) and records rc per step.
# Warm-cache runs: each step is ~(warmup + 1 timed rep); cold compiles only
# on cache miss.
set -u
cd "$(dirname "$0")/.."
LOG=${AB_LOG:-logs/TPU_AB_r05.log}
: > "$LOG"

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) env: $*" >> "$LOG"
  env "$@" timeout "${STEP_TIMEOUT:-2700}" python -u bench.py >> "$LOG" 2>&1
  echo "rc=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

# A: shipped r5 default — unroll 0 (fori_loop), single tail bucket 32
run default_unroll0_bucket32
# B: r4 shipped default reproduced — unroll 16, full ladder
run r4_unroll16_ladder SCVX_UNROLL_SUBSTEPS=16 BENCH_BUCKETS=128,64,32
# C: unroll 0 + full ladder (isolates the bucket-schedule effect)
run unroll0_ladder BENCH_BUCKETS=128,64,32
# D: unroll 0 + two tail buckets
run unroll0_bucket64_32 BENCH_BUCKETS=64,32
