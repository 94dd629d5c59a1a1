#!/bin/bash
# CI runner with per-module process isolation (VERDICT r4 item 3).
#
# Why not one `pytest tests/`: this 4-core host hits an INTERMITTENT XLA:CPU
# crash (SIGSEGV/SIGABRT inside a pjit compile) in suite-length runs — r4's
# verdict saw it twice at two different tests, and each crash site passes in
# isolation. The crash probability grows with accumulated in-process compile
# state, so each test module runs in its own python process; a module that
# dies on a crash signal (not a test failure) is retried once in a fresh
# process and the retry is LOGGED — a test *failure* (rc=1) is never retried.
#
# Usage: scripts/ci.sh [logfile]   (default logs/CI_run.log, committed path)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-logs/CI_run.log}
: > "$LOG"
overall=0
t_start=$SECONDS

# PALLAS_AXON_POOL_IPS must be CLEARED for CPU runs: sitecustomize dials the
# TPU relay at every python start when it is set, and a concurrent/former TPU
# claim-holder can hang the interpreter on a TCP recv at startup (and wedge
# the relay for the TPU process too) — see .claude/skills/verify/SKILL.md.
PENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

for f in tests/test_*.py; do
  t0=$SECONDS
  timeout 2400 $PENV python -m pytest "$f" -q --no-header -p no:cacheprovider \
    >> "$LOG" 2>&1
  rc=$?
  # 134=SIGABRT, 139=SIGSEGV, 132=SIGILL via shell; also bare signal codes
  if [ $rc -ge 128 ] || [ $rc -eq 124 ]; then
    echo "CRASH rc=$rc in $f — retrying once in a fresh process" >> "$LOG"
    timeout 2400 $PENV python -m pytest "$f" -q --no-header -p no:cacheprovider \
      >> "$LOG" 2>&1
    rc=$?
    [ $rc -eq 0 ] && echo "retry of $f PASSED (intermittent compiler crash)" >> "$LOG"
  fi
  dt=$((SECONDS - t0))
  if [ $rc -ne 0 ]; then
    overall=1
    echo "FAIL $f rc=$rc (${dt}s)" | tee -a "$LOG"
  else
    echo "ok   $f (${dt}s)" >> "$LOG"
  fi
done

echo "CI total $((SECONDS - t_start))s overall_rc=$overall" | tee -a "$LOG"
exit $overall
