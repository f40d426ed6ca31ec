#!/bin/bash
# Run the test suite one file per pytest process.
#
# Why: XLA's CPU compiler intermittently segfaults when a very large
# compile (the RBD T=500 fixture solve, the 6-DoF rollout) happens late in
# a long-lived process that has already done ~90 compiles — a compiler
# flake, not a library bug (every file passes in a fresh process).
# Per-file processes bound that state and isolate any crash.
#
# Usage: scripts/run_tests.sh [-m "not slow"] [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  echo "== $f"
  timeout 1500 python -m pytest "$f" -q "$@" || fail=1
done
exit $fail
