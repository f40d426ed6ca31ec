#!/bin/bash
# Run the test suite one file per pytest process.
#
# Why: XLA's CPU compiler intermittently segfaults when a very large
# compile (the RBD T=500 fixture solve, the 6-DoF rollout) happens late in
# a long-lived process that has already done ~90 compiles — a compiler
# flake, not a library bug (every file passes in a fresh process).
# Per-file processes bound that state and isolate any crash.
#
# Each file's exit code is printed (rc=N; rc=124 means the per-file
# timeout killed it — raise PER_FILE_TIMEOUT) so a non-zero suite exit is
# attributable from the log alone.
#
# Usage: scripts/run_tests.sh [-m "not slow"] [extra pytest args]
set -u
cd "$(dirname "$0")/.."
PER_FILE_TIMEOUT=${PER_FILE_TIMEOUT:-2400}
fail=0
for f in tests/test_*.py; do
  echo "== $f"
  timeout "$PER_FILE_TIMEOUT" python -m pytest "$f" -q "$@"
  rc=$?
  echo "rc=$rc ($f)"
  [ "$rc" -ne 0 ] && fail=1
done
exit $fail
