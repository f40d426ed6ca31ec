"""A/B: full DDP (second-order dynamics terms) vs pure iLQR.

Measures iterations-to-convergence and wall time for the two-link swing-up
(and optionally the RBD arm at T=100) with ``ILQRConfig(ddp=True)`` against
the default.  The reference has no DDP mode (pure iLQR,
src/backward_pass.jl:25-40); this quantifies what the extension buys.

Run: python scripts/bench_ddp.py [--rbd] [--batch B] [--T T] [--max-iter N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve


def run(problem, xs0, us0, cfg, label):
    solver = jax.jit(
        jax.vmap(lambda xs, us: solve(problem, xs, us, config=cfg)),
        static_argnums=(),
    )
    t0 = time.time()
    res = solver(xs0, us0)
    jax.block_until_ready(res.cost)
    compile_s = time.time() - t0
    t0 = time.time()
    res = solver(xs0, us0)
    jax.block_until_ready(res.cost)
    wall = time.time() - t0
    conv = int(np.sum(np.asarray(res.status) == int(Status.CONVERGED)))
    iters = np.asarray(res.iterations)
    print(f"[{label:12s}] converged {conv}/{iters.shape[0]}  "
          f"iters mean {iters.mean():.1f} p50 {np.percentile(iters, 50):.0f} "
          f"max {iters.max()}  cost mean {np.asarray(res.cost).mean():.6g}  "
          f"wall {wall:.3f}s  (compile {compile_s:.1f}s)", flush=True)
    return iters, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rbd", action="store_true")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--tol", type=float, default=1e-6)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.rbd:
        from ilqr_tpu.models.rbd import make_rbd_arm_problem

        problem = make_rbd_arm_problem()
        n, m = problem.state_dim, problem.control_dim
        x0 = jnp.asarray(0.05 * rng.standard_normal((args.batch, n)))
    else:
        from ilqr_tpu.models.two_link import make_two_link_problem

        problem = make_two_link_problem()
        n, m = 4, 2
        x0 = jnp.asarray(0.2 * rng.standard_normal((args.batch, n)))
    us0 = jnp.asarray(0.01 * rng.standard_normal((args.batch, args.T, m)))
    xs0 = jax.vmap(lambda x, u: rollout(problem.dynamics, x, u))(x0, us0)

    print("device:", jax.devices()[0].device_kind, flush=True)
    # exact_ls_delta so acceptance resolution (f32 eps*cost) doesn't
    # confound the curvature comparison (see BENCH.md round 4, strict row).
    base = ILQRConfig(max_iter=args.max_iter, tol=args.tol,
                      exact_ls_delta=True)
    it_ilqr, w_ilqr = run(problem, xs0, us0, base, "ilqr")
    it_ddp, w_ddp = run(problem, xs0, us0, base.replace(ddp=True), "ddp")
    run(problem, xs0, us0,
        base.replace(ddp=True, adaptive_reg=True, reg_backtrack_trigger=4),
        "ddp+areg")
    run(problem, xs0, us0,
        base.replace(adaptive_reg=True, reg_backtrack_trigger=4),
        "ilqr+areg")
    print(f"iteration ratio ddp/ilqr: {it_ddp.mean() / it_ilqr.mean():.3f}  "
          f"wall ratio: {w_ddp / w_ilqr:.3f}", flush=True)


if __name__ == "__main__":
    main()
