"""Receding-horizon MPC driver (BASELINE.json config 5).

The reference has no MPC loop — `fit` is a single offline solve.  This
driver runs warm-started receding-horizon replanning entirely on device:
one ``lax.scan`` over control steps, each step solving an H-step iLQR
problem warm-started by shifting the previous plan, applying the first
control, and advancing the (simulated) plant.  ``vmap`` over the scenario
axis + ``shard_map`` over the mesh scales it to pod-size scenario counts.
"""

from __future__ import annotations

import os
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


def batch_mpc_run_chunked(problem: Problem, x0s: jax.Array, horizon: int,
                          n_steps: int,
                          config: ILQRConfig = DEFAULT_CONFIG,
                          step_chunk: int = 10,
                          checkpoint_path: Optional[str] = None,
                          checkpoint_every: int = 1,
                          on_chunk=None) -> MPCResult:
    """Checkpointable scenario-batched MPC for long fleet runs.

    Same results as :func:`batch_mpc_run`, but the ``n_steps`` control
    steps are dispatched in host chunks of ``step_chunk`` steps, and (with
    ``checkpoint_path``) the full run state — MPC carry ``(x, us_warm)``
    plus all per-step outputs so far — is saved to disk every
    ``checkpoint_every`` chunks via
    :func:`ilqr_tpu.utils.checkpoint.save_solver_state`.  If
    ``checkpoint_path`` exists when the run starts, the run RESUMES from
    the saved step instead of starting over — a killed fleet run (host
    preemption, device fault, operator ctrl-C) loses at most one chunk.

    ``n_steps`` must be divisible by ``step_chunk``.
    ``on_chunk(step_idx)`` streams progress; return True to stop early
    (the partial result is still checkpointed and returned, with the
    remaining steps zero-filled).
    """

    from ilqr_tpu.utils.checkpoint import load_solver_state, save_solver_state

    assert n_steps % step_chunk == 0, (n_steps, step_chunk)
    B, n = x0s.shape
    m = problem.control_dim
    n_chunks = n_steps // step_chunk

    @jax.jit
    @highest_precision
    def run_chunk(x, us_warm):
        # Full-horizon replanning for step_chunk steps, batched.
        def scan_steps(carry, _):
            x_b, us_b = carry

            def step_one(x0, us_warm0):
                xs_warm = rollout(problem.dynamics, x0, us_warm0)
                result = solve(problem, xs_warm, us_warm0, config=config)
                ok = result.status != int(Status.LINESEARCH_FAILED)
                plan = jnp.where(ok, result.us, us_warm0)
                u_apply = plan[0]
                x_next = problem.dynamics(x0, u_apply)
                us_next = jnp.concatenate([plan[1:], plan[-1:]], axis=0)
                return (x_next, us_next,
                        (u_apply, result.cost, result.iterations,
                         result.status))

            x_next, us_next, out = jax.vmap(step_one)(x_b, us_b)
            return (x_next, us_next), (x_next,) + out

        (x, us_warm), outs = jax.lax.scan(scan_steps, (x, us_warm), None,
                                          length=step_chunk)
        return x, us_warm, outs

    # Host-side accumulators, preallocated so the checkpoint pytree has a
    # fixed structure at every step.
    import numpy as np

    dtype = np.asarray(x0s).dtype
    state = {
        "step": np.zeros((), np.int64),
        "x": np.asarray(x0s),
        "us_warm": np.zeros((B, horizon, m), dtype),
        "xs": np.zeros((n_steps, B, n), dtype),
        "us": np.zeros((n_steps, B, m), dtype),
        "costs": np.zeros((n_steps, B), dtype),
        "iters": np.zeros((n_steps, B), np.int32),
        "statuses": np.zeros((n_steps, B), np.int32),
    }
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        state = load_solver_state(checkpoint_path, state)

    start_chunk = int(state["step"]) // step_chunk
    x = jnp.asarray(state["x"])
    us_warm = jnp.asarray(state["us_warm"])
    for ci in range(start_chunk, n_chunks):
        x, us_warm, outs = run_chunk(x, us_warm)
        xs_c, us_c, costs_c, iters_c, st_c = jax.device_get(outs)
        lo = ci * step_chunk
        hi = lo + step_chunk
        state["xs"][lo:hi] = xs_c
        state["us"][lo:hi] = us_c
        state["costs"][lo:hi] = costs_c
        state["iters"][lo:hi] = iters_c
        state["statuses"][lo:hi] = st_c
        state["x"] = np.asarray(jax.device_get(x))
        state["us_warm"] = np.asarray(jax.device_get(us_warm))
        state["step"] = np.int64(hi)
        if checkpoint_path is not None and (
                (ci + 1 - start_chunk) % checkpoint_every == 0
                or ci == n_chunks - 1):
            save_solver_state(checkpoint_path, state)
        if on_chunk is not None and on_chunk(hi):
            break

    xs = np.concatenate([np.asarray(x0s)[None], state["xs"]], axis=0)
    return MPCResult(
        xs=jnp.asarray(np.moveaxis(xs, 1, 0)),
        us=jnp.asarray(np.moveaxis(state["us"], 1, 0)),
        costs=jnp.asarray(np.moveaxis(state["costs"], 1, 0)),
        iterations=jnp.asarray(np.moveaxis(state["iters"], 1, 0)),
        statuses=jnp.asarray(np.moveaxis(state["statuses"], 1, 0)),
    )
