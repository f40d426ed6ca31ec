#!/bin/bash
# Round-3 full bench refresh.  Sequential: concurrent TPU clients block
# each other on the single-tenant tunnel.  Logs to bench_logs/r3/ (kept
# in-repo per the publish-everything rule, BENCH.md round 3).
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

run batched      1200 bench.py --config batched
run strict       1200 bench.py --config strict
run mpc          1200 bench.py --config mpc
run mpc_batch    1200 bench.py --config mpc_batch --batch 1024
run roofline     1800 scripts/roofline.py
# RBD at T=100 with the converging setup (Tassa reg, host-chunked
# dispatches).  max_iter=100: round-2's 15 was nowhere near enough.
run rbd_T100     3000 bench.py --config rbd --T 100 --batch 1024
# Device-fault stress: the round-2 single-dispatch max_iter=60 run killed
# the device; same shape through the chunked driver must complete.
run rbd_T100_it60_chunked 3000 bench.py --config rbd --T 100 --batch 1024 --max-iter 60 --iter-chunk 10
run long_horizon 3600 bench.py --config long_horizon --backend pallas --batch 256
# The reference's own problem scale (animate_RBD_2_link.jl:8-20).
run rbd_T1000    5400 bench.py --config rbd --T 1000 --batch 256
# Scaling table: virtual 8-device CPU mesh (harness validation).
run scaling_cpu  1800 scripts/bench_scaling.py --platform cpu --devices 8
echo "ALL DONE"
