#!/bin/bash
# Round-3 third sweep: strict-criterion A/B for exact_ls_delta, and the
# per-iteration solve-cost decomposition.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo
mkdir -p bench_logs/r3

run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout "$to" python "$@" > "bench_logs/r3/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))"
  tail -4 "bench_logs/r3/$name.log" | grep -v WARNING || true
}

run strict_exact_delta 3000 bench.py --config strict --exact-delta
run profile_solve_iter 3600 scripts/profile_solve_iter.py
echo "ALL DONE"
