"""Device-mesh scenario parallelism: shard_map over a ``scenarios`` axis.

Per-scenario solves are independent, so the layout is pure data parallelism:
scenario batches are sharded over the mesh, each device runs the vmapped
solver on its shard, and only scalar metrics (converged counts, mean cost)
cross the interconnect — one ``psum`` per solve, riding ICI.  This is the
TPU-native replacement for the reference's nonexistent distributed story
(SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.parallel.batching import batch_solve
from ilqr_tpu.problem import Problem

SCENARIO_AXIS = "scenarios"


def make_scenario_mesh(n_devices: Optional[int] = None,
                       devices=None) -> Mesh:
    """A 1-D mesh over the scenario axis (all local/global devices)."""

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def sharded_batch_solve(problem: Problem, mesh: Mesh,
                        x0s: jax.Array, us0: jax.Array,
                        config: ILQRConfig = DEFAULT_CONFIG):
    """Solve ``B`` scenarios sharded over the mesh.

    ``x0s [B, n]``, ``us0 [B, T, m]`` with ``B`` divisible by the mesh size.
    Returns ``(SolverResult with batch axis, metrics dict)`` where metrics
    are globally psum-reduced scalars (identical on every device).
    """

    n_dev = mesh.devices.size
    assert x0s.shape[0] % n_dev == 0, (
        f"batch {x0s.shape[0]} not divisible by mesh size {n_dev}")

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=(P(SCENARIO_AXIS), P()),
        # The solver's while_loop carries start from replicated constants
        # (iteration counters, inf cost) and become device-varying after one
        # step; skip the varying-manual-axes check rather than pvary-ing
        # every init leaf.
        check_vma=False,
    )
    def run_shard(x0s_local, us0_local):
        result = batch_solve(problem, x0s_local, us0_local, config=config)
        converged = (result.status == int(Status.CONVERGED)).astype(jnp.int32)
        n_converged = jax.lax.psum(jnp.sum(converged), SCENARIO_AXIS)
        total_cost = jax.lax.psum(
            jnp.sum(jnp.where(jnp.isfinite(result.cost), result.cost, 0.0)),
            SCENARIO_AXIS)
        total_iters = jax.lax.psum(
            jnp.sum(result.iterations), SCENARIO_AXIS)
        metrics = {
            "n_converged": n_converged,
            "mean_cost": total_cost / x0s.shape[0],
            "total_iterations": total_iters,
        }
        return result, metrics

    return run_shard(x0s, us0)


def shard_scenarios(mesh: Mesh, *arrays):
    """Device_put arrays with the batch axis sharded over the scenario mesh."""

    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return tuple(jax.device_put(a, sharding) for a in arrays)
