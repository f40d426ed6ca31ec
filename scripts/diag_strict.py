"""Diagnose strict-criterion (tol=1e-6 on sum((du)^2), no gradient gates)
failing lanes on the 2-link headline config.

For every non-CONVERGED lane, report:
  * final status (LINESEARCH_FAILED vs MAX_ITER)
  * final du_sq (how far above 1e-6 the last accepted step was)
  * iterations used
  * final cost vs the converged population

    python scripts/diag_strict.py [--batch 4096] [--max-iter 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import make_batch_solver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--no-exact-delta", action="store_true")
    args = ap.parse_args()

    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=args.max_iter, tol=1e-6, tol_grad=0.0,
                        tol_grad_rel=0.0, backward_backend=args.backend,
                        scan_unroll=8,
                        exact_ls_delta=not args.no_exact_delta)
    solve_fn = make_batch_solver(problem, config, engine="fused")

    B, T = args.batch, args.T
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    t0 = time.perf_counter()
    result = jax.block_until_ready(solve_fn(x0s, us0))
    print(f"[diag_strict] device={jax.devices()[0]} "
          f"compile+run={time.perf_counter()-t0:.1f}s", file=sys.stderr)

    status = np.asarray(result.status)
    du_sq = np.asarray(result.du_sq)
    iters = np.asarray(result.iterations)
    cost = np.asarray(result.cost)

    for s, name in [(int(Status.CONVERGED), "CONVERGED"),
                    (int(Status.LINESEARCH_FAILED), "LS_FAILED"),
                    (int(Status.MAX_ITER), "MAX_ITER")]:
        m = status == s
        if not m.any():
            print(f"{name:>10s} n=0")
            continue
        d = du_sq[m]
        print(f"{name:>10s} n={m.sum():5d}  "
              f"du_sq p50={np.median(d):.3e} p90={np.percentile(d, 90):.3e} "
              f"max={d.max():.3e}  iters p50={np.median(iters[m]):.0f} "
              f"max={iters[m].max()}  cost p50={np.median(cost[m]):.6g}")

    # Of the failing lanes: how many are within 10x / 100x of the tol?
    fail = status != int(Status.CONVERGED)
    if fail.any():
        d = du_sq[fail]
        for f in (1e-6, 1e-5, 1e-4, 1e-3):
            print(f"  failing lanes with final du_sq <= {f:.0e}: "
                  f"{int((d <= f).sum())}/{fail.sum()}")


if __name__ == "__main__":
    main()
