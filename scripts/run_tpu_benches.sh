#!/bin/bash
# Run every benchmark config sequentially on the (single-tenant, tunneled)
# TPU.  Concurrent TPU clients block each other on this tunnel, so this is
# the only safe way to collect a full BENCH.md refresh.  Logs to
# /tmp/bench_logs/.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p /tmp/bench_logs
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 3000 python "$@" > "/tmp/bench_logs/$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S))"
  tail -3 "/tmp/bench_logs/$name.log" | grep -v WARNING || true
}

run batched       bench.py --config batched
run strict        bench.py --config strict
run mpc           bench.py --config mpc
run mpc_batch     bench.py --config mpc_batch --batch 1024
run roofline      scripts/roofline.py
run rbd_T100      bench.py --config rbd --T 100 --batch 1024 --max-iter 15
# --backend pallas on long_horizon fans out to scan+pallas+associative.
run long_horizon  bench.py --config long_horizon --backend pallas --batch 256
run rbd_T1000     bench.py --config rbd --T 1000 --batch 256 --max-iter 15
echo "ALL DONE"
