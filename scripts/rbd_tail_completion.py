"""Run the reference-scale RBD straggler lanes to completion (VERDICT r4
next #2).

The reference runs this problem with max_iter = 1e6
(test/RBD_2_link_example/animate_RBD_2_link.jl:16); the repo's benches cap
at 100 and ~9% of lanes consistently finish RUNNING.  This reproduces the
bench's exact scenario batch (same PRNG), solves with a deep iteration cap
and straggler compaction (tail passes cost a fraction of full-batch
passes), and reports the per-lane outcome of every lane that would have
hit the 100-iteration cap.

    python scripts/rbd_tail_completion.py [--max-iter 600] [--batch 256]
        [--ls-expected --ls-c 0.4] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--max-iter", type=int, default=600)
    ap.add_argument("--iter-chunk", type=int, default=4)
    ap.add_argument("--compact", default="128,32")
    ap.add_argument("--ls-expected", action="store_true")
    ap.add_argument("--ls-c", type=float, default=0.1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--snapshot-path", default="/tmp/rbd_tail_snap.npz")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from ilqr_tpu.batched import make_chunked_batch_solver
    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
    from ilqr_tpu.problem import rollout

    B, T = args.batch, args.T
    n, m = 16, 8
    dtype = jnp.float32
    problem = make_rbd_arm_problem()
    # EXACTLY the bench's scenario distribution (bench.py bench_batched,
    # problem_name="rbd", noise=0.05, PRNGKey(0)).
    nominal = jnp.asarray(
        [0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8, dtype)
    noise = 0.05
    scale = jnp.asarray([0.4 * noise] * 3 + [noise] * (n // 2 - 3)
                        + [0.0] * (n // 2), dtype)
    key = jax.random.PRNGKey(0)
    x0s = nominal + scale * jax.random.normal(key, (B, n), dtype)
    us0 = jnp.zeros((B, T, m), dtype)

    config = ILQRConfig(
        max_iter=args.max_iter, tol=1e-5, tol_grad=1e-10, tol_grad_rel=1e-6,
        backward_backend="pallas", scan_unroll=1, derivative_chunk=100,
        adaptive_reg=True, reg=1.0, reg_min=1e-3, reg_scale=10.0,
        reg_backtrack_trigger=1, ls_expected_decrease=args.ls_expected,
        ls_c=args.ls_c)

    sizes = tuple(int(s) for s in args.compact.split(",") if s.strip())
    t_start = time.time()
    solver = make_chunked_batch_solver(
        problem, config, iter_chunk=args.iter_chunk, snapshot_every=1,
        snapshot_path=args.snapshot_path, compact_sizes=sizes,
        on_chunk=lambda p, r: print(
            f"  passes={p} running={r} t={time.time()-t_start:.0f}s",
            flush=True) and False)
    roll = jax.jit(jax.vmap(lambda x0, us: rollout(problem.dynamics,
                                                   x0, us)))
    result = jax.block_until_ready(solver(roll(x0s, us0), us0))

    status = np.asarray(result.status)
    iters = np.asarray(result.iterations)
    du = np.asarray(result.du_sq)
    cost = np.asarray(result.cost)
    conv = int((status == int(Status.CONVERGED)).sum())
    print(f"\nTOTAL {conv}/{B} converged at max_iter={args.max_iter} "
          f"(wall {time.time()-t_start:.0f}s)")
    tail = np.flatnonzero(iters >= 100)
    print(f"lanes that would have hit the 100-iteration cap: {tail.size}")
    print(" lane  iters  status  final_du_sq   cost")
    for i in tail:
        print(f" {i:4d}  {iters[i]:5d}  {Status(status[i]).name:18s} "
              f"{du[i]:.3e}  {cost[i]:.6e}")
    by = {}
    for i in tail:
        by.setdefault(Status(status[i]).name, []).append(int(iters[i]))
    for k, v in sorted(by.items()):
        print(f"  {k}: {len(v)} lanes, iters p50={int(np.median(v))} "
              f"max={max(v)}")


if __name__ == "__main__":
    main()
