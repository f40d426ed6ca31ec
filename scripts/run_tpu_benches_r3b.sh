#!/bin/bash
# Round-3 follow-up sweep (after the analytic-JVP commit):
#  - rbd_T100_it15_ab: byte-for-byte the r2 bench config (B=1024, T=100,
#    max_iter=15) for a direct before/after of the analytic derivative
#    rule against r2's 58.3 solves/s
#  - convergence tails at higher iteration caps
#  - larger batch at reference scale for throughput
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

run rbd_T100_it15_ab 1800 bench.py --config rbd --T 100 --batch 1024 --max-iter 15
run rbd_T100_it300   3000 bench.py --config rbd --T 100 --batch 1024 --max-iter 300
run rbd_T1000_it200  5400 bench.py --config rbd --T 1000 --batch 256 --max-iter 200
run rbd_T1000_b512   5400 bench.py --config rbd --T 1000 --batch 512 --max-iter 100
echo "ALL DONE"
