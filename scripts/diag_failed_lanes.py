"""Diagnose LINESEARCH_FAILED lanes: what |dV1| and cost do they end at?

    python scripts/diag_failed_lanes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu import batched as bl
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import make_batch_solver


def main():
    problem = make_two_link_problem()
    config = ILQRConfig(max_iter=30, tol=1e-5, tol_grad=1e-10,
                        backward_backend="pallas")
    solve_fn = make_batch_solver(problem, config, engine="fused")

    B, T = 4096, 100
    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.1 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    result = jax.block_until_ready(solve_fn(x0s, us0))

    # One extra backward pass at the final iterate → per-lane dV1.
    @jax.jit
    def final_dv1(xs, us):
        xs_bl = jnp.moveaxis(xs, 0, -1)
        us_bl = jnp.moveaxis(us, 0, -1)
        models = bl.derivatives_bl(problem, xs_bl, us_bl)
        reg = jnp.full((B,), config.reg, dtype)
        _, _, dv1, _ = bl.riccati_bl(*models, reg=reg, config=config)
        return dv1

    dv1 = np.asarray(final_dv1(result.xs, result.us))
    status = np.asarray(result.status)
    cost = np.asarray(result.cost)
    for s, name in [(int(Status.CONVERGED), "CONVERGED"),
                    (int(Status.LINESEARCH_FAILED), "LS_FAILED"),
                    (int(Status.MAX_ITER), "MAX_ITER")]:
        m = status == s
        if not m.any():
            continue
        a = np.abs(dv1[m])
        c = cost[m]
        rel = a / np.maximum(c, 1e-30)
        print(f"{name:>10s} n={m.sum():5d} "
              f"|dV1| p50={np.median(a):.3e} p90={np.percentile(a, 90):.3e} "
              f"max={a.max():.3e}  cost p50={np.median(c):.4g} "
              f"|dV1|/cost p50={np.median(rel):.3e} "
              f"p99={np.percentile(rel, 99):.3e} max={rel.max():.3e}")


if __name__ == "__main__":
    main()
