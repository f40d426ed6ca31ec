"""Receding-horizon MPC driver (BASELINE.json config 5).

The reference has no MPC loop — `fit` is a single offline solve.  This
driver runs warm-started receding-horizon replanning entirely on device:
one ``lax.scan`` over control steps, each step solving an H-step iLQR
problem warm-started by shifting the previous plan, applying the first
control, and advancing the (simulated) plant.  ``vmap`` over the scenario
axis + ``shard_map`` over the mesh scales it to pod-size scenario counts.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import solve


class MPCResult(NamedTuple):
    xs: jax.Array          # [n_steps+1, n] closed-loop state trajectory
    us: jax.Array          # [n_steps, m] applied controls
    costs: jax.Array       # [n_steps] planned cost at each replan
    iterations: jax.Array  # [n_steps] iLQR iterations per replan
    statuses: jax.Array    # [n_steps] solver status per replan


@highest_precision
def mpc_run(problem: Problem, x0: jax.Array, horizon: int, n_steps: int,
            config: ILQRConfig = DEFAULT_CONFIG,
            plant_dynamics: Optional[Callable] = None,
            u_init: Optional[jax.Array] = None) -> MPCResult:
    """Run ``n_steps`` of receding-horizon control from ``x0``.

    ``plant_dynamics`` (defaults to the model dynamics) advances the true
    system — pass a different function to simulate model mismatch.
    Warm start: the previous plan shifted by one step, last control held.
    """

    plant = plant_dynamics or problem.dynamics
    m = u_init.shape[-1] if u_init is not None else problem.control_dim
    assert m is not None, "problem.control_dim or u_init required"

    us_warm0 = (u_init if u_init is not None
                else jnp.zeros((horizon, m), dtype=x0.dtype))

    def step(carry, _):
        x, us_warm = carry
        xs_warm = rollout(problem.dynamics, x, us_warm)
        result = solve(problem, xs_warm, us_warm, config=config)
        # On a failed solve fall back to the warm-start plan.
        ok = result.status != int(Status.LINESEARCH_FAILED)
        plan = jnp.where(ok, result.us, us_warm)
        u_apply = plan[0]
        x_next = plant(x, u_apply)
        us_next = jnp.concatenate([plan[1:], plan[-1:]], axis=0)
        out = (x_next, u_apply, result.cost, result.iterations, result.status)
        return (x_next, us_next), out

    (_, _), (xs, us, costs, iters, statuses) = jax.lax.scan(
        step, (x0, us_warm0), None, length=n_steps)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    return MPCResult(xs=xs, us=us, costs=costs, iterations=iters,
                     statuses=statuses)


def make_mpc_runner(problem: Problem, horizon: int, n_steps: int,
                    config: ILQRConfig = DEFAULT_CONFIG):
    """Jitted single-scenario MPC runner; vmap for scenario batches."""

    @jax.jit
    def run(x0):
        return mpc_run(problem, x0, horizon, n_steps, config)

    return run


def batch_mpc_run(problem: Problem, x0s: jax.Array, horizon: int,
                  n_steps: int, config: ILQRConfig = DEFAULT_CONFIG
                  ) -> MPCResult:
    """Scenario-batched MPC: ``x0s [B, n]`` → MPCResult with batch axis."""

    return jax.vmap(lambda x0: mpc_run(problem, x0, horizon, n_steps, config))(x0s)
