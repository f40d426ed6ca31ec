"""Phase-pipelined solving over a ``pipeline`` mesh axis (PP).

The reference is a single-threaded serial solver (SURVEY.md §2.4: every
parallelism row is absent there).  This module supplies the pipeline-
parallel row: the two phases of one iLQR iteration — the backward Riccati
pass and the line-searched forward rollout (`ilqr_tpu.step.ilqr_step`'s
two halves) — run as dedicated pipeline stages on different devices, with
scenario microbatches streaming around the stage ring GPipe-style.

Layout
------
A 2-stage ring over mesh axis ``"pipeline"``:

* stage 0 runs :func:`ilqr_tpu.step.ilqr_step_backward` on its resident
  microbatch (derivatives + Riccati recursion -> ``duffs, Ks, dV1, dV2``);
* stage 1 runs :func:`ilqr_tpu.step.ilqr_step_apply` (stationarity gate,
  backtracking rollouts, convergence bookkeeping);
* after every tick the resident microbatch states rotate one stage with
  ``lax.ppermute`` (riding ICI on hardware meshes).

With 2 microbatches in flight both stages are busy every tick after a
1-tick fill bubble, and each microbatch completes one full solver
iteration per 2 ticks — numerically identical to the serial loop, because
a microbatch's forward phase at tick t+1 consumes exactly the backward
outputs computed for it at tick t (tested against the fused engine in
``tests/test_pipeline.py``).

When to use
-----------
Honestly: rarely, for this workload.  iLQR phases share one set of
problem data and per-scenario state, so data parallelism (shard the
scenario axis, ``parallel.mesh``) does the same work with zero inter-
device traffic, while PP ships whole trajectory states + gains
(``O(T·(n+m+mn)·mb)`` floats) across the ring every tick.  PP becomes
interesting when the stages are heterogeneous — e.g. the backward phase
compiled with a large-VMEM Pallas budget on one device class while
rollout-heavy line searches run elsewhere, or when phase programs are too
large to co-reside.  It is implemented for capability completeness and as
the pattern template; the bench story stays DP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig
from ilqr_tpu.problem import Problem
from ilqr_tpu.solver import SolverResult
from ilqr_tpu.step import (
    finalize_status,
    ilqr_step_apply,
    ilqr_step_backward,
    initial_state,
)

PIPELINE_AXIS = "pipeline"
N_STAGES = 2  # backward | forward — the two halves of ilqr_step


def make_pipeline_mesh(devices=None) -> Mesh:
    """A 2-device mesh over the ``pipeline`` axis."""

    import numpy as np

    if devices is None:
        devices = jax.devices()
    assert len(devices) >= N_STAGES, "pipeline needs 2 devices"
    return Mesh(np.asarray(devices[:N_STAGES]), (PIPELINE_AXIS,))


def pipelined_solve(problem: Problem, mesh: Mesh, x0s: jax.Array,
                    us0: jax.Array,
                    config: ILQRConfig = DEFAULT_CONFIG) -> SolverResult:
    """Solve ``B`` scenarios as 2 microbatches streaming through the
    2-stage phase pipeline.

    ``x0s [B, n]``, ``us0 [B, T, m]`` with ``B`` divisible by 2; returns a
    batch-first :class:`SolverResult` in the original scenario order, equal
    to the fused single-device solve (up to compilation rounding).
    """

    from ilqr_tpu.batched import (
        make_batch_last_engine,
        rollout_bl,
        total_cost_bl,
    )

    B = x0s.shape[0]
    assert B % N_STAGES == 0, f"batch {B} not divisible by {N_STAGES}"
    mb = B // N_STAGES
    T, m = us0.shape[1], us0.shape[2]
    n = x0s.shape[1]
    dtype = x0s.dtype

    engine = make_batch_last_engine(problem, None, config)

    # Stack microbatches on a leading stage axis (sharded over the ring):
    # microbatch s starts resident on device s, batch-LAST within a stage.
    x0_st = x0s.reshape(N_STAGES, mb, n)
    us_st = us0.reshape(N_STAGES, mb, T, m)

    n_ticks = N_STAGES * config.max_iter + 1  # +1 fill bubble

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P(PIPELINE_AXIS), P(PIPELINE_AXIS)),
        out_specs=P(PIPELINE_AXIS),
        check_vma=False,
    )
    def run(x0_local, us_local):
        # Local shapes [1, mb, ...] -> batch-last [..., mb].
        x0_bl = jnp.moveaxis(x0_local[0], 0, -1)          # [n, mb]
        us_bl = jnp.moveaxis(us_local[0], 0, -1)          # [T, m, mb]
        xs_bl = rollout_bl(problem, x0_bl, us_bl)
        state = initial_state(xs_bl, us_bl, config, lane_shape=(mb,))
        stage = jax.lax.axis_index(PIPELINE_AXIS)

        # Rotating payload: solver state + the backward outputs produced
        # for it (zeros until its first pass through stage 0).
        duffs0 = jnp.zeros((T, m, mb), dtype)
        Ks0 = jnp.zeros((T, m, n, mb), dtype)
        dV10 = jnp.zeros((mb,), dtype)
        dV20 = jnp.zeros((mb,), dtype)
        payload = (state, duffs0, Ks0, dV10, dV20)

        fwd_perm = [(i, (i + 1) % N_STAGES) for i in range(N_STAGES)]

        def tick(t, payload):
            state, duffs, Ks, dV1, dV2 = payload

            def do_backward(_):
                d, K, v, v2 = ilqr_step_backward(engine, state)
                return state, d, K, v, v2

            def do_forward(_):
                new_state, _aux = ilqr_step_apply(
                    engine, config, state, duffs, Ks, dV1, dV2)
                # Tick 0's forward stage holds a microbatch whose backward
                # outputs are still the zero placeholders — applying them
                # would fake a du_sq=0 "converged" no-op step.  Pass the
                # state through untouched instead (the 1-tick fill bubble).
                primed = t > 0
                merged = jax.tree.map(
                    lambda a, b: jnp.where(primed, a, b), new_state, state)
                return (merged, duffs, Ks, dV1, dV2)

            payload = jax.lax.cond(stage == 0, do_backward, do_forward,
                                   operand=None)
            return jax.tree.map(
                lambda x: jax.lax.ppermute(x, PIPELINE_AXIS, fwd_perm),
                payload)

        payload = jax.lax.fori_loop(0, n_ticks, tick, payload)
        # n_ticks rotations; rotate the remainder of the ring so each
        # microbatch lands back on its starting stage for the output gather.
        for _ in range(-n_ticks % N_STAGES):
            payload = jax.tree.map(
                lambda x: jax.lax.ppermute(x, PIPELINE_AXIS, fwd_perm),
                payload)
        state = payload[0]

        status = finalize_status(state.status)
        cost = jnp.where(
            jnp.isinf(state.prev_cost),
            total_cost_bl(problem, state.xs, state.us, None).astype(dtype),
            state.prev_cost)
        return SolverResult(
            xs=jnp.moveaxis(state.xs, -1, 0)[None],
            us=jnp.moveaxis(state.us, -1, 0)[None],
            cost=cost[None],
            iterations=state.iteration[None],
            status=status[None],
            reg=state.reg[None],
            alpha=state.alpha[None],
            du_sq=state.du_sq[None],
        )

    out = run(x0_st, us_st)
    # [N_STAGES, mb, ...] -> [B, ...] in the caller's scenario order.
    return jax.tree.map(lambda a: a.reshape((B,) + a.shape[2:]), out)
