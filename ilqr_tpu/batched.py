"""Fused batch-last solver engine — the production path for scenario batches.

``ilqr_tpu.solver.solve`` is written per-scenario and scaled with ``vmap``.
That is always correct, but on TPU the ``vmap``-inserted leading batch axis
leaves tiny ``[..., n, n]`` minor dimensions on every materialized array
(scan inputs/outputs, loop carries), and the hardware tiles the minor two
dims to (8, 128) — a 4x4-minor array pays a 64x padding tax in memory
bandwidth.  Measured on a v5e: the identical Riccati recursion runs at
0.09 ms when the batch is the minor axis and ~30 ms through the vmap
layout.

This module implements the same algorithm natively batch-LAST: every
array carries the scenario batch as its trailing (lane) axis —
trajectories ``[T+1, n, B]``, gains ``[T, m, n, B]``, per-lane scalars
``[B]``.  User dynamics/cost callables are still written per-scenario;
they are vmapped with ``in_axes=-1 / out_axes=-1`` so their internals fuse
and only batch-minor arrays materialize.  Per-lane line search and
convergence masks replicate exactly the semantics of the vmapped solver
(tested for equality).

The backward recursion runs in the fused Pallas kernel on TPU and a
batch-last ``lax.scan`` elsewhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ilqr_tpu.config import DEFAULT_CONFIG, ILQRConfig, Status
from ilqr_tpu.ops import smallmat as sm
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem
from ilqr_tpu.solver import SolverResult
from ilqr_tpu.step import StepEngine, finalize_status, ilqr_step, initial_state


def _batched_callables(problem: Problem):
    bdyn = jax.vmap(problem.dynamics, in_axes=(-1, -1), out_axes=-1)
    bcost = jax.vmap(problem.cost, in_axes=(-1, -1), out_axes=-1)
    bfinal = jax.vmap(problem.final_cost, in_axes=-1, out_axes=-1)
    return bdyn, bcost, bfinal


@highest_precision
def rollout_bl(problem: Problem, x0, us, unroll=1):
    """Open-loop rollout, batch-last: ``x0 [n, B]``, ``us [T, m, B]`` →
    ``xs [T+1, n, B]``."""

    bdyn, _, _ = _batched_callables(problem)

    def step(x, u):
        x_next = bdyn(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us, unroll=unroll)
    return jnp.concatenate([x0[None], xs], axis=0)


def total_cost_bl(problem: Problem, xs, us, x_ref=None):
    """Per-lane total cost ``[B]`` (same semantics as problem.total_cost)."""

    steps, final = step_costs_bl(problem, xs, us, x_ref)
    return jnp.sum(steps, axis=0) + final


def step_costs_bl(problem: Problem, xs, us, x_ref=None):
    """Per-timestep running costs ``[T, B]`` and terminal cost ``[B]``
    (batch-last analogue of ``problem.step_costs``)."""

    _, bcost, bfinal = _batched_callables(problem)
    xs_run = xs[:-1]
    if x_ref is not None:
        xs_run = xs_run - x_ref[: xs_run.shape[0]]
    return jax.vmap(bcost)(xs_run, us), bfinal(xs[-1])


@highest_precision
def derivatives_bl(problem: Problem, xs, us, chunk: int = 0):
    """All local models, batch-last: returns
    ``As [T,n,n,B], Bs [T,n,m,B], qx [T,n,B], ru [T,m,B], Qxx [T,n,n,B],
    Pux [T,m,n,B], Ruu [T,m,m,B], qxN [n,B], QN [n,n,B]``.

    ``chunk > 0`` evaluates the horizon in ``lax.map`` chunks of that many
    timesteps instead of one whole-horizon ``vmap``: the jacfwd
    intermediates of a heavy dynamics (RBD: RK4 over CRBA/RNEA with n+m
    tangents) only stay live for one chunk, bounding peak HBM at long T
    (T=1000 RBD at batch 256 OOMs un-chunked) at the cost of a serial
    chunk loop.  ``T`` must be divisible by ``chunk``; results agree with
    the unchunked sweep to rounding (different fusion order).
    """

    n = xs.shape[1]

    if problem.dynamics_jacobians is not None:
        jac_b = jax.vmap(problem.dynamics_jacobians, in_axes=(-1, -1),
                         out_axes=-1)
    else:
        jac = jax.jacfwd(problem.dynamics, argnums=(0, 1))
        jac_b = jax.vmap(jac, in_axes=(-1, -1), out_axes=-1)

    if problem.cost_quadratization is not None:
        def quad_one(x, u):
            _q, qx, ru, Qxx, Pux, Ruu = problem.cost_quadratization(x, u)
            return qx, ru, Qxx, Pux, Ruu
    else:
        def cost_z(z):
            return problem.cost(z[:n], z[n:])

        grad_z = jax.grad(cost_z)
        hess_z = jax.jacfwd(grad_z)

        def quad_one(x, u):
            z = jnp.concatenate([x, u])
            gz = grad_z(z)
            Hz = hess_z(z)
            return gz[:n], gz[n:], Hz[:n, :n], Hz[n:, :n], Hz[n:, n:]

    quad_b = jax.vmap(quad_one, in_axes=(-1, -1), out_axes=-1)

    def per_t(x_t, u_t):
        A, B = jac_b(x_t, u_t)
        return (A, B) + quad_b(x_t, u_t)

    T = us.shape[0]
    if chunk and chunk < T:
        assert T % chunk == 0, (T, chunk)
        xs_r = xs[:-1].reshape((T // chunk, chunk) + xs.shape[1:])
        us_r = us.reshape((T // chunk, chunk) + us.shape[1:])
        out = jax.lax.map(lambda ab: jax.vmap(per_t)(ab[0], ab[1]),
                          (xs_r, us_r))
        As, Bs, qx, ru, Qxx, Pux, Ruu = (
            o.reshape((T,) + o.shape[2:]) for o in out)
    else:
        As, Bs, qx, ru, Qxx, Pux, Ruu = jax.vmap(per_t)(xs[:-1], us)

    if problem.final_cost_quadratization is not None:
        def final_one(x):
            _q, qxN, QN = problem.final_cost_quadratization(x)
            return qxN, QN

        qxN, QN = jax.vmap(final_one, in_axes=-1, out_axes=-1)(xs[-1])
    else:
        fgrad = jax.grad(problem.final_cost)
        fhess = jax.jacfwd(fgrad)
        qxN = jax.vmap(fgrad, in_axes=-1, out_axes=-1)(xs[-1])
        QN = jax.vmap(fhess, in_axes=-1, out_axes=-1)(xs[-1])
    return As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN


@highest_precision
def riccati_bl_scan(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg,
                    symmetrize=True, unroll=1):
    """Batch-last backward recursion as a lax.scan (portable fallback;
    same algebra as ilqr_tpu.backward.riccati_step)."""

    def step(carry, inp):
        s_vec, S = carry
        A, B, qx_k, ru_k, Qxx_k, Pux_k, Ruu_k = inp

        BT_S = sm.mtm_bl(B, S)
        g = ru_k + sm.mtv_bl(B, s_vec)
        G = Pux_k + sm.mm_bl(BT_S, A)
        H = Ruu_k + sm.mm_bl(BT_S, B)

        L = sm.cholesky_bl(H, reg)
        duff = -sm.cho_solve_bl(L, g)
        K = -sm.cho_solve_bl(L, G)

        H_duff = sm.mv_bl(H, duff)
        s_next = (qx_k + sm.mtv_bl(A, s_vec) + sm.mtv_bl(K, H_duff)
                  + sm.mtv_bl(K, g) + sm.mtv_bl(G, duff))
        KtG = sm.mtm_bl(K, G)
        S_next = (Qxx_k + sm.mtm_bl(A, sm.mm_bl(S, A))
                  + sm.mtm_bl(K, sm.mm_bl(H, K))
                  + KtG + sm.transpose_bl(KtG))
        if symmetrize:
            S_next = 0.5 * (S_next + sm.transpose_bl(S_next))
        out = (duff, K, sm.vv_bl(duff, g), 0.5 * sm.vv_bl(duff, H_duff))
        return (s_next, S_next), out

    _, (duffs, Ks, dv1, dv2) = jax.lax.scan(
        step, (qxN, QN), (As, Bs, qx, ru, Qxx, Pux, Ruu),
        reverse=True, unroll=unroll)
    return duffs, Ks, jnp.sum(dv1, axis=0), jnp.sum(dv2, axis=0)


def riccati_bl(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg, config):
    if config.backward_backend == "pallas":
        from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_bl
        from ilqr_tpu.ops.riccati_dispatch import pallas_interpret_default

        return riccati_scan_pallas_bl(
            As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg=reg,
            symmetrize=config.symmetrize,
            interpret=pallas_interpret_default())
    return riccati_bl_scan(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg,
                           symmetrize=config.symmetrize,
                           unroll=config.scan_unroll)


@highest_precision
def closed_loop_rollout_bl(problem: Problem, xs, us, duffs, Ks, alpha,
                           unroll=1):
    """Per-lane closed-loop rollout: ``alpha [B]``."""

    bdyn, _, _ = _batched_callables(problem)

    def step(x_new, inp):
        x_old, u_old, duff, K = inp
        u_new = u_old + alpha[None, :] * duff + sm.mv_bl(K, x_new - x_old)
        x_next = bdyn(x_new, u_new)
        return x_next, (x_new, u_new)

    x_last, (xs_new, us_new) = jax.lax.scan(
        step, xs[0], (xs[:-1], us, duffs, Ks), unroll=unroll)
    xs_new = jnp.concatenate([xs_new, x_last[None]], axis=0)
    return xs_new, us_new


@highest_precision
def forward_pass_bl(problem: Problem, xs, us, duffs, Ks, prev_cost,
                    x_ref=None, config: ILQRConfig = DEFAULT_CONFIG,
                    active=None, dV1=None, dV2=None, alpha_init=None):
    """Per-lane backtracking line search, batch-last.

    Semantics identical to the vmapped ``forward_pass``: each lane accepts
    the first alpha in 1, 1/2, … with any cost decrease (NaN rejected) and
    freezes; the loop runs until every lane accepted or the ladder is
    exhausted.  ``dV1``/``dV2`` ([B]) feed the optional expected-decrease
    acceptance (``config.ls_expected_decrease``; see
    ``forward.forward_pass``).  Returns ``(xs [T+1,n,B], us [T,m,B],
    cost [B], accepted [B], alpha [B], backtracks [B])``.
    """

    B = xs.shape[-1]
    dtype = xs.dtype
    if active is None:
        active = jnp.ones((B,), bool)
    use_expected = config.ls_expected_decrease and dV1 is not None

    if config.exact_ls_delta:
        steps_old, final_old = step_costs_bl(problem, xs, us, x_ref)

    def cond(carry):
        k, _alpha, accepted, *_ = carry
        return jnp.logical_and(k < config.max_backtracks, ~jnp.all(accepted))

    def body(carry):
        k, alpha, accepted, bts, xs_b, us_b, cost_b = carry
        xs_new, us_new = closed_loop_rollout_bl(
            problem, xs, us, duffs, Ks, alpha, unroll=config.scan_unroll)
        if use_expected:
            exp_impr = -(alpha * dV1 + alpha * alpha * dV2)
            thresh = config.ls_c * jnp.maximum(exp_impr, 0.0).astype(dtype)
        else:
            thresh = jnp.zeros((), dtype)
        if config.exact_ls_delta:
            steps_new, final_new = step_costs_bl(problem, xs_new, us_new,
                                                 x_ref)
            cost = (jnp.sum(steps_new, axis=0) + final_new).astype(dtype)
            delta = (jnp.sum(steps_new - steps_old, axis=0)
                     + (final_new - final_old)).astype(dtype)
            # Converging-step acceptance (see forward.forward_pass): a
            # candidate bitwise identical to the iterate (the gain step
            # underflowed the f32 update) is the step the convergence
            # test fires on; delta for it is pure re-evaluation noise.
            du_step_sq = jnp.sum((us_new - us) ** 2, axis=(0, 1))
            ok = jnp.logical_or(
                jnp.logical_or(jnp.isinf(prev_cost), -delta > thresh),
                du_step_sq == 0)
            # isfinite, not just ~isnan: an inf first-iteration cost must
            # backtrack (see forward.forward_pass for the full rationale).
            improve = jnp.logical_and(ok, jnp.isfinite(cost))
            accept_now = jnp.logical_and(~accepted, improve)
        else:
            cost = total_cost_bl(problem, xs_new, us_new, x_ref).astype(dtype)
            accept_now = jnp.logical_and(~accepted,
                                         (prev_cost - cost) > thresh)
        take = accept_now[None, None, :]
        xs_b = jnp.where(take, xs_new, xs_b)
        us_b = jnp.where(take, us_new, us_b)
        cost_b = jnp.where(accept_now, cost, cost_b)
        bts = jnp.where(accepted, bts, k)
        accepted = jnp.logical_or(accepted, accept_now)
        alpha = jnp.where(accepted, alpha, alpha * config.alpha_factor)
        return (k + 1, alpha, accepted, bts, xs_b, us_b, cost_b)

    init = (
        jnp.int32(0),
        # alpha_init: per-lane warm-started first rung
        # (config.ls_alpha_warm_start; None = the reference's alpha0).
        (jnp.full((B,), config.alpha0, dtype) if alpha_init is None
         else alpha_init.astype(dtype)),
        # Inactive lanes start "accepted" so they neither roll out usefully
        # nor keep the ladder spinning; the placeholder is masked off the
        # returned flag so callers see accepted=False for skipped lanes
        # (matching the per-scenario forward_pass).
        ~active,
        jnp.zeros((B,), jnp.int32),
        xs,
        us,
        jnp.full((B,), jnp.inf, dtype),
    )
    k, alpha, accepted, bts, xs_b, us_b, cost_b = jax.lax.while_loop(
        cond, body, init)
    # Ladder-exhausted lanes report backtracks == max_backtracks (the number
    # of rejected alphas), matching the per-scenario forward_pass convention.
    bts = jnp.where(accepted, bts, k)
    return xs_b, us_b, cost_b, jnp.logical_and(accepted, active), alpha, bts


@highest_precision
def forward_pass_bl_parallel(problem: Problem, xs, us, duffs, Ks, prev_cost,
                             x_ref=None,
                             config: ILQRConfig = DEFAULT_CONFIG,
                             active=None, dV1=None, dV2=None):
    """Parallel-alpha line search: evaluate ``R = config.parallel_alpha_block``
    ladder rungs per block as extra batch lanes in ONE closed-loop rollout.

    Decisions are identical to :func:`forward_pass_bl` (first accepting
    alpha in ladder order, same acceptance rules), but the serial T-step
    rollout — latency-bound per step at long horizons — runs once per
    block instead of once per rung.  Blocks repeat until every lane
    accepted or ``max_backtracks`` rungs have been tried.
    """

    R = config.parallel_alpha_block
    B = xs.shape[-1]
    T = us.shape[0]
    dtype = xs.dtype
    if active is None:
        active = jnp.ones((B,), bool)
    use_expected = config.ls_expected_decrease and dV1 is not None

    if config.exact_ls_delta:
        steps_old, final_old = step_costs_bl(problem, xs, us, x_ref)

    # Expanded-batch constants (lane index = r * B + b).
    xs_r = jnp.tile(xs, (1, 1, R))
    us_r = jnp.tile(us, (1, 1, R))
    duffs_r = jnp.tile(duffs, (1, 1, R))
    Ks_r = jnp.tile(Ks, (1, 1, 1, R))
    n_blocks = -(-config.max_backtracks // R)

    def try_block(kb):
        """All candidates of block ``kb``: rungs kb*R ... kb*R+R-1."""

        rungs = kb * R + jnp.arange(R)
        alphas = config.alpha0 * jnp.asarray(
            config.alpha_factor, dtype) ** rungs.astype(dtype)   # [R]
        alpha_vec = jnp.repeat(alphas, B)                         # [R*B]
        xs_new, us_new = closed_loop_rollout_bl(
            problem, xs_r, us_r, duffs_r, Ks_r, alpha_vec,
            unroll=config.scan_unroll)

        if use_expected:
            exp_impr = -(alphas[:, None] * dV1[None, :]
                         + (alphas ** 2)[:, None] * dV2[None, :])  # [R, B]
            thresh = config.ls_c * jnp.maximum(exp_impr, 0.0).astype(dtype)
        else:
            thresh = jnp.zeros((R, B), dtype)

        if config.exact_ls_delta:
            steps_new, final_new = step_costs_bl(problem, xs_new, us_new,
                                                 x_ref)
            cost = (jnp.sum(steps_new, axis=0)
                    + final_new).reshape(R, B).astype(dtype)
            delta = (jnp.sum(
                steps_new.reshape(T, R, B)
                - steps_old[:, None, :], axis=0)
                + (final_new.reshape(R, B) - final_old[None, :])
            ).astype(dtype)
            du_step_sq = jnp.sum(
                (us_new.reshape(T, us.shape[1], R, B)
                 - us[:, :, None, :]) ** 2, axis=(0, 1))          # [R, B]
            ok = jnp.logical_or(
                jnp.logical_or(jnp.isinf(prev_cost)[None, :],
                               -delta > thresh),
                du_step_sq == 0)
            ok = jnp.logical_and(ok, jnp.isfinite(cost))
        else:
            cost = total_cost_bl(problem, xs_new, us_new,
                                 x_ref).reshape(R, B).astype(dtype)
            ok = (prev_cost[None, :] - cost) > thresh
        # Rungs past the sequential ladder's budget must not accept
        # (parity with max_backtracks).
        ok = jnp.logical_and(ok, (rungs < config.max_backtracks)[:, None])
        return xs_new, us_new, cost, ok, alphas

    def cond(carry):
        kb, accepted, *_ = carry
        return jnp.logical_and(kb < n_blocks, ~jnp.all(accepted))

    def body(carry):
        kb, accepted, bts, alpha_b, xs_b, us_b, cost_b = carry
        xs_new, us_new, cost, ok, alphas = try_block(kb)
        first = jnp.argmax(ok, axis=0).astype(jnp.int32)          # [B]
        any_ok = jnp.any(ok, axis=0)
        accept_now = jnp.logical_and(~accepted, any_ok)

        def pick(x):
            xr = x.reshape(x.shape[:-1] + (R, B))
            idx = first.reshape((1,) * (xr.ndim - 2) + (1, B))
            return jnp.take_along_axis(xr, idx, axis=-2)[..., 0, :]

        xs_sel = pick(xs_new)
        us_sel = pick(us_new)
        cost_sel = jnp.take_along_axis(cost, first[None, :], axis=0)[0]
        take = accept_now[None, None, :]
        xs_b = jnp.where(take, xs_sel, xs_b)
        us_b = jnp.where(take, us_sel, us_b)
        cost_b = jnp.where(accept_now, cost_sel, cost_b)
        alpha_b = jnp.where(accept_now,
                            jnp.take(alphas, first), alpha_b)
        bts = jnp.where(accept_now, kb * jnp.int32(R) + first, bts)
        # Lanes still unaccepted have rejected every rung tried so far;
        # they also report the fully-halved alpha, exactly as the
        # sequential ladder's carry does on exhaustion.
        tried = jnp.minimum((kb + 1) * jnp.int32(R),
                            jnp.int32(config.max_backtracks))
        settled = jnp.logical_or(accepted, accept_now)
        bts = jnp.where(settled, bts, tried)
        alpha_b = jnp.where(
            settled, alpha_b,
            config.alpha0 * jnp.asarray(config.alpha_factor, alpha_b.dtype)
            ** tried.astype(alpha_b.dtype))
        accepted = settled
        return (kb + 1, accepted, bts, alpha_b, xs_b, us_b, cost_b)

    init = (
        jnp.int32(0),
        ~active,
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), config.alpha0, dtype),
        xs,
        us,
        jnp.full((B,), jnp.inf, dtype),
    )
    _, accepted, bts, alpha_b, xs_b, us_b, cost_b = jax.lax.while_loop(
        cond, body, init)
    return (xs_b, us_b, cost_b, jnp.logical_and(accepted, active),
            alpha_b, bts)


def make_batch_last_engine(problem: Problem, x_ref_bl,
                           config: ILQRConfig) -> StepEngine:
    """The batch-last StepEngine: same algorithm as the per-scenario engine,
    every lane-shaped value is ``[B]`` and trajectories carry a trailing
    lane axis."""

    def backward(xs, us, reg):
        models = derivatives_bl(problem, xs, us,
                                chunk=config.derivative_chunk)
        duffs, Ks, dv1, dv2 = riccati_bl(*models, reg=reg, config=config)
        return duffs, Ks, dv1, dv2

    def forward(xs, us, duffs, Ks, prev_cost, active, dV1, dV2,
                alpha_init=None):
        if config.parallel_alpha_block > 0:
            # alpha_init is rejected at config construction for this path.
            return forward_pass_bl_parallel(
                problem, xs, us, duffs, Ks, prev_cost,
                x_ref_bl, config, active=active, dV1=dV1, dV2=dV2)
        return forward_pass_bl(problem, xs, us, duffs, Ks, prev_cost,
                               x_ref_bl, config, active=active, dV1=dV1,
                               dV2=dV2, alpha_init=alpha_init)

    return StepEngine(
        backward=backward,
        forward=forward,
        du_sq=lambda a, b: jnp.sum((a - b) ** 2, axis=(0, 1)),
        select=jnp.where,
        select_traj=lambda m, new, old: jnp.where(m[None, None, :], new, old),
    )


def _scatter_lanes(full, cur, idx):
    """numpy write-back of batch-last lanes: ``full[..., idx] = cur``.
    ``idx`` may contain duplicates (compaction pad lanes) — they carry
    identical values, so last-write-wins is correct."""

    import numpy as np

    out = np.array(full)
    out[..., idx] = cur
    return out


def make_chunked_batch_solver(problem: Problem,
                              config: ILQRConfig = DEFAULT_CONFIG,
                              iter_chunk: int = 10,
                              x_ref=None,
                              on_chunk=None,
                              snapshot_every: int = 0,
                              max_retries: int = 2,
                              snapshot_path: str = None,
                              compact_sizes=(),
                              _fault_hook=None):
    """A host-chunked variant of :func:`batched_solve_fused`.

    Returns ``solve_fn(xs0, us0) -> SolverResult`` (batch-FIRST interface,
    same results as the single-dispatch path) that runs the solver loop as
    a sequence of device dispatches of at most ``iter_chunk`` iterations
    each, with the state staying resident on device between dispatches.

    Why: a single ``lax.while_loop`` over many heavy iterations is one
    enormous device program — on the tunneled v5e an RBD batch at
    ``max_iter=60`` ran >60 s in one dispatch and died with a device fault
    (``UNAVAILABLE: TPU device error``, see BENCH.md round-3 section),
    and a single dispatch gives zero progress visibility.  Chunking bounds
    per-dispatch runtime at a ~μs-scale dispatch cost per chunk and lets
    ``on_chunk(n_passes, n_running)`` stream progress (e.g. for logging or
    early abort: return True from ``on_chunk`` to stop).

    ``x_ref`` (batch-first ``[B, T, n]`` or None) is baked into the
    returned solver, mirroring ``make_batch_solver``'s static problem.

    ``snapshot_every > 0`` adds crash resilience against *transient device
    faults surfaced through a still-live PJRT client* (e.g. the
    ``UNAVAILABLE: TPU device error`` that killed the B=512/T=1000 RBD
    sweep mid-run, BENCH.md round 3): every that-many chunks the solver
    state is copied to HOST memory, and a ``JaxRuntimeError`` during a
    chunk is retried up to ``max_retries`` times (consecutive — the
    counter resets after any successful chunk) from the last snapshot
    instead of losing the whole solve.  Retry clears the dispatch's
    executable cache so the dispatch recompiles from the on-disk
    compilation cache.  Before retrying, the backend is probed with a
    trivial transfer; if the client itself is dead (a genuinely restarted
    TPU worker invalidates the in-process client — recovery from that
    requires a new process), the probe's error propagates immediately
    rather than burning retries.  Costs one device→host transfer of the
    solver state per snapshot.

    ``snapshot_path`` extends the resilience ACROSS processes: every host
    snapshot is also persisted to that file
    (:func:`ilqr_tpu.utils.checkpoint.save_solver_state`), and a fresh
    process whose ``solve_fn`` finds the file resumes from it instead of
    starting over — this is the recovery story for the worker-restart
    fault that kills the in-process client outright (observed twice on
    this hardware at B=512/T=1000): the whole run completes across
    process restarts, losing at most ``snapshot_every`` chunks each.
    The file is removed on successful completion.

    ``compact_sizes`` (descending lane counts, e.g. ``(128, 32)``) turns on
    STRAGGLER COMPACTION: once the number of RUNNING lanes fits a listed
    size, finished lanes are written back to a host-side copy of the full
    batch and the solve continues with only the stragglers, gathered into
    a smaller batch-last program.  At reference RBD scale ~10% of lanes
    hit 40+ extra iterations (BENCH.md round 4: 55 of 100 full-batch
    passes serviced <=26/256 lanes); compaction makes those tail passes
    pay for the lanes that need them, and makes deep tail runs
    (``max_iter`` 500+, VERDICT r4 next #2) affordable.  Each listed size
    compiles its own chunk program (one extra compile per size — keep the
    list short).  The step body is per-lane, so compaction changes results
    only by compiled-program rounding (tested equal on CPU, where programs
    of different batch shapes produce identical lane arithmetic).
    """

    x_ref_bl = None if x_ref is None else jnp.moveaxis(x_ref, 0, -1)
    engine = make_batch_last_engine(problem, x_ref_bl, config)

    @functools.partial(jax.jit, donate_argnums=(0,))
    @highest_precision
    def run_chunk(state, n_passes):
        def cond(carry):
            state, n_passes, k = carry
            return jnp.logical_and(
                jnp.any(state.status == int(Status.RUNNING)),
                jnp.logical_and(n_passes < config.max_iter, k < iter_chunk))

        def body(carry):
            state, n_passes, k = carry
            return ilqr_step(engine, config, state)[0], n_passes + 1, k + 1

        state, n_passes, _ = jax.lax.while_loop(
            cond, body, (state, n_passes, jnp.int32(0)))
        n_running = jnp.sum(
            (state.status == int(Status.RUNNING)).astype(jnp.int32))
        return state, n_passes, n_running

    @jax.jit
    @highest_precision
    def prepare(xs0, us0):
        xs_bl = jnp.moveaxis(xs0, 0, -1)
        us_bl = jnp.moveaxis(us0, 0, -1)
        B = xs_bl.shape[-1]
        return initial_state(xs_bl, us_bl, config, lane_shape=(B,))

    @jax.jit
    @highest_precision
    def finalize(state):
        status = finalize_status(state.status)
        cost = jnp.where(
            jnp.isinf(state.prev_cost),
            total_cost_bl(problem, state.xs, state.us,
                          x_ref_bl).astype(state.xs.dtype),
            state.prev_cost)
        return SolverResult(
            xs=jnp.moveaxis(state.xs, -1, 0),
            us=jnp.moveaxis(state.us, -1, 0),
            cost=cost,
            iterations=state.iteration,
            status=status,
            reg=state.reg,
            alpha=state.alpha,
            du_sq=state.du_sq,
        )

    def solve_fn(xs0, us0):
        import os

        import numpy as np

        state = prepare(xs0, us0)
        n_passes = jnp.int32(0)
        snapshot = None
        # Straggler-compaction bookkeeping: ``full_host`` holds the
        # finished lanes of the ORIGINAL batch (numpy pytree), ``cur_idx``
        # maps each current device lane to its original index.  None ⇔
        # the device state is still the full batch.
        full_host = None
        cur_idx = None
        sizes = tuple(sorted(set(int(s) for s in compact_sizes),
                             reverse=True))

        def merge_full(host_state):
            """Scatter the current (possibly compacted) host state back
            into the full-batch copy; returns the full pytree."""

            if full_host is None:
                return host_state
            return jax.tree.map(
                lambda full, cur: _scatter_lanes(full, cur, cur_idx),
                full_host, host_state)
        if snapshot_every > 0 or snapshot_path is not None:
            snapshot = (jax.device_get(state), 0)
        if snapshot_path is not None and os.path.exists(snapshot_path):
            # Cross-process resume: a previous process persisted its
            # progress before dying (e.g. a TPU worker restart).
            from ilqr_tpu.utils.checkpoint import load_solver_state

            import numpy as np

            template = {"state": snapshot[0], "n_passes": np.int64(0)}
            saved = load_solver_state(snapshot_path, template)
            state = jax.device_put(saved["state"])
            n_passes = jnp.int32(int(saved["n_passes"]))
            snapshot = (saved["state"], int(saved["n_passes"]))
        chunk_idx = 0
        retries = 0
        while True:
            try:
                if _fault_hook is not None:
                    _fault_hook(chunk_idx)  # test seam: simulated fault
                state, n_passes, n_running = run_chunk(state, n_passes)
                # The chunk's health is only known once its outputs
                # materialize on the host; fetch inside the try so a
                # deferred device fault is caught and retried too.
                n_passes_h = int(n_passes)
                n_running_h = int(n_running)
            except jax.errors.JaxRuntimeError:
                if snapshot is None or retries >= max_retries:
                    raise
                retries += 1
                # Probe the client before retrying: if it is dead (backend
                # restart, not a transient fault) this raises immediately
                # with the real error instead of burning retries on
                # recompiles that cannot succeed.
                jax.block_until_ready(jax.device_put(jnp.zeros(())))
                # The faulted dispatch's cached executables may be stale;
                # recompile (served from the persistent compilation cache).
                run_chunk.clear_cache()
                host_state, n_passes_h = snapshot
                # Snapshots always hold the merged FULL batch; restoring
                # one resets any compaction (the next chunks re-compact).
                full_host = None
                cur_idx = None
                state = jax.device_put(host_state)
                n_passes = jnp.int32(n_passes_h)
                continue
            retries = 0  # max_retries bounds CONSECUTIVE faults
            chunk_idx += 1
            every = snapshot_every if snapshot_every > 0 else (
                1 if snapshot_path is not None else 0)
            if every and chunk_idx % every == 0:
                snapshot = (merge_full(jax.device_get(state)), n_passes_h)
                if snapshot_path is not None:
                    from ilqr_tpu.utils.checkpoint import save_solver_state

                    import numpy as np

                    save_solver_state(snapshot_path, {
                        "state": snapshot[0],
                        "n_passes": np.int64(n_passes_h)})
            if on_chunk is not None and on_chunk(n_passes_h, n_running_h):
                break
            if n_running_h == 0 or n_passes_h >= config.max_iter:
                break
            if sizes and n_running_h > 0:
                cur_B = int(state.status.shape[-1])
                # Smallest listed size that still fits the stragglers and
                # shrinks the batch.
                fits = [s for s in sizes if n_running_h <= s < cur_B]
                if fits:
                    target = fits[-1]
                    host_state = jax.device_get(state)
                    full_host = merge_full(host_state)
                    if cur_idx is None:
                        cur_idx = np.arange(cur_B)
                    status = np.asarray(host_state.status)
                    running = np.flatnonzero(
                        status == int(Status.RUNNING))
                    done = np.flatnonzero(status != int(Status.RUNNING))
                    pad = done[:target - running.size]
                    local_sel = np.concatenate([running, pad])
                    state = jax.device_put(jax.tree.map(
                        lambda a: a[..., local_sel], host_state))
                    cur_idx = cur_idx[local_sel]
        if snapshot_path is not None and os.path.exists(snapshot_path):
            os.remove(snapshot_path)
        if full_host is not None:
            state = jax.device_put(merge_full(jax.device_get(state)))
        return finalize(state)

    return solve_fn


@highest_precision
def batched_solve_fused(problem: Problem, xs0, us0,
                        x_ref: Optional[jax.Array] = None,
                        config: ILQRConfig = DEFAULT_CONFIG) -> SolverResult:
    """Solve a batch of scenarios with the fused batch-last engine.

    Batch-FIRST interface (matching ``parallel.batch_solve``):
    ``xs0 [B, T+1, n]``, ``us0 [B, T, m]`` → SolverResult with batch axis
    first on every field.  Internally everything runs batch-last; the two
    transposes at entry/exit are the only layout moves.  The iteration body
    is the shared :func:`ilqr_tpu.step.ilqr_step` — only the engine
    (layout) differs from ``solver.solve``.
    """

    # To batch-last.
    xs_bl = jnp.moveaxis(xs0, 0, -1)   # [T+1, n, B]
    us_bl = jnp.moveaxis(us0, 0, -1)   # [T, m, B]
    x_ref_bl = None if x_ref is None else jnp.moveaxis(x_ref, 0, -1)
    B = xs_bl.shape[-1]
    dtype = xs_bl.dtype

    engine = make_batch_last_engine(problem, x_ref_bl, config)

    # The while_loop needs a global pass counter alongside the per-lane
    # iteration counts (a finished lane stops counting but the loop keeps
    # going for the stragglers).
    def cond(carry):
        state, n_passes = carry
        return jnp.logical_and(
            jnp.any(state.status == int(Status.RUNNING)),
            n_passes < config.max_iter,
        )

    def body(carry):
        state, n_passes = carry
        return ilqr_step(engine, config, state)[0], n_passes + 1

    init = initial_state(xs_bl, us_bl, config, lane_shape=(B,))
    final, _ = jax.lax.while_loop(cond, body, (init, jnp.int32(0)))

    status = finalize_status(final.status)
    cost = jnp.where(jnp.isinf(final.prev_cost),
                     total_cost_bl(problem, final.xs, final.us,
                                   x_ref_bl).astype(dtype),
                     final.prev_cost)

    return SolverResult(
        xs=jnp.moveaxis(final.xs, -1, 0),
        us=jnp.moveaxis(final.us, -1, 0),
        cost=cost,
        iterations=final.iteration,
        status=status,
        reg=final.reg,
        alpha=final.alpha,
        du_sq=final.du_sq,
    )
