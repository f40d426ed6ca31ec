"""Single-chip batched solving: vmap over scenarios.

Thousands of perturbed initial states / MPC scenarios are solved in one
compiled program.  Each scenario carries its own line-search alpha,
regularization, iteration count and status flag — a diverged scenario is
masked data, not a crash (the reference instead asserts and dies on the
first NaN, src/forward_pass.jl:89-90).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import SolverResult, solve


def batch_solve(problem: Problem, x0s: jax.Array, us0: jax.Array,
                x_refs: Optional[jax.Array] = None,
                config: ILQRConfig = DEFAULT_CONFIG,
                warm_xs: Optional[jax.Array] = None,
                engine: str = "vmap") -> SolverResult:
    """Solve a batch of scenarios: ``x0s [B, n]``, ``us0 [B, T, m]``.

    Initial state trajectories are open-loop rollouts of ``us0`` from each
    ``x0`` (pass ``warm_xs [B, T+1, n]`` to override, e.g. for MPC warm
    starts).  Returns a ``SolverResult`` with a leading batch axis on every
    field.

    ``engine``:
    * ``"vmap"`` — vmap the per-scenario solver (portable reference path);
    * ``"fused"`` — the batch-last engine (``ilqr_tpu.batched``), the fast
      path on TPU: identical results, batch-minor memory layout, fused
      Pallas Riccati when ``config.backward_backend == "pallas"``.
    """

    if warm_xs is None:
        warm_xs = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(
            x0s, us0)

    if engine == "fused":
        from ilqr_tpu.batched import batched_solve_fused

        assert x_refs is None or x_refs.ndim == warm_xs.ndim
        x_ref = None if x_refs is None else x_refs
        return batched_solve_fused(problem, warm_xs, us0, x_ref, config)

    if x_refs is None:
        def solve_one(xs, us):
            return solve(problem, xs, us, None, config)
        return jax.vmap(solve_one)(warm_xs, us0)

    def solve_one_ref(xs, us, x_ref):
        return solve(problem, xs, us, x_ref, config)
    return jax.vmap(solve_one_ref)(warm_xs, us0, x_refs)


def make_batch_solver(problem: Problem, config: ILQRConfig = DEFAULT_CONFIG,
                      engine: str = "vmap"):
    """Jitted ``(x0s, us0) -> SolverResult`` batched solver."""

    @jax.jit
    def solve_fn(x0s, us0):
        return batch_solve(problem, x0s, us0, config=config, engine=engine)

    return solve_fn


def batch_metrics(result: SolverResult) -> dict:
    """Aggregate per-scenario results into scalar batch metrics."""

    converged = result.status == int(Status.CONVERGED)
    failed = result.status == int(Status.LINESEARCH_FAILED)
    return {
        "n_converged": jnp.sum(converged.astype(jnp.int32)),
        "n_failed": jnp.sum(failed.astype(jnp.int32)),
        "mean_iterations": jnp.mean(result.iterations.astype(jnp.float32)),
        "mean_cost": jnp.mean(jnp.where(jnp.isfinite(result.cost), result.cost, 0.0)),
        "max_cost": jnp.max(jnp.where(jnp.isfinite(result.cost), result.cost, -jnp.inf)),
    }
