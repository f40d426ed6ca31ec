"""Backward Riccati pass: one vmapped derivative sweep + a pure-algebra scan.

Reference structure (src/backward_pass.jl:324-357): a serial loop that, per
timestep, re-runs autodiff and then does the gain/value algebra.  Here the
two concerns are split TPU-style:

1. all linearizations and cost quadratizations for the whole horizon are
   computed in one batched ``vmap`` sweep (``ilqr_tpu.derivatives``);
2. the inherently sequential value recursion is a ``lax.scan(reverse=True)``
   over pure matmul/solve steps (:func:`riccati_scan`), with an optional
   parallel-in-time ``associative_scan`` backend (``ilqr_tpu.pit``).

The per-step algebra replicates the reference exactly:

* Q-function blocks g, G, H — ``optimal_controller_param``,
  src/backward_pass.jl:177-186;
* regularized gain solve (H + reg·I) — ``feedback_parameters``,
  src/backward_pass.jl:207-218 (Cholesky instead of LAPACK ``\\``);
* value recursion (s, s_vec, S) — ``step_back``,
  src/backward_pass.jl:262-273.  Note the *unregularized* H feeds the value
  recursion, as in the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqr_tpu.config import ILQRConfig, DEFAULT_CONFIG
from ilqr_tpu.derivatives import (
    linearize_dynamics,
    quadratize_final_cost,
    quadratize_running_cost,
)
from ilqr_tpu.ops.linalg import solve_psd_small
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem


class BackwardResult(NamedTuple):
    duffs: jax.Array  # [T, m] feedforward terms
    Ks: jax.Array     # [T, m, n] feedback gains
    dV1: jax.Array    # scalar: sum_t duff_t . g_t   (expected linear decrease)
    dV2: jax.Array    # scalar: sum_t 0.5 duff_t . H_t duff_t


def riccati_step(carry, inp, reg, symmetrize):
    """One backward value-recursion step (pure linear algebra).

    ``carry = (s, s_vec [n], S [n, n])`` is the quadratic value model at
    t+1; ``inp = (A, B, q, qx, ru, Qxx, Pux, Ruu)`` the local model at t.
    """

    s, s_vec, S = carry
    A, B, q, qx, ru, Qxx, Pux, Ruu = inp

    BT_S = B.T @ S
    g = ru + B.T @ s_vec                      # Qu
    G = Pux + BT_S @ A                        # Qux  [m, n]
    H = Ruu + BT_S @ B                        # Quu  [m, m]

    m = H.shape[-1]
    H_reg = H + reg * jnp.eye(m, dtype=H.dtype)
    duff = -solve_psd_small(H_reg, g)
    K = -solve_psd_small(H_reg, G)

    H_duff = H @ duff
    s_new = q + s + 0.5 * duff @ H_duff + duff @ g
    s_vec_new = qx + A.T @ s_vec + K.T @ H_duff + K.T @ g + G.T @ duff
    S_new = Qxx + A.T @ S @ A + K.T @ H @ K + K.T @ G + G.T @ K
    if symmetrize:
        S_new = 0.5 * (S_new + S_new.T)

    out = (duff, K, duff @ g, 0.5 * duff @ H_duff)
    return (s_new, s_vec_new, S_new), out


@highest_precision
def riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                 reg, symmetrize=True, unroll=1):
    """Whole-horizon backward recursion over precomputed local models.

    Inputs are time-major ``[T, ...]``; the scan runs t = T-1 … 0
    (``reverse=True``) seeded from the terminal quadratization
    (src/backward_pass.jl:335-336).  Returns ``BackwardResult``.
    """

    def step(carry, inp):
        return riccati_step(carry, inp, reg=reg, symmetrize=symmetrize)

    init = (qN, qxN, QN)
    _, (duffs, Ks, dv1, dv2) = jax.lax.scan(
        step, init, (As, Bs, q, qx, ru, Qxx, Pux, Ruu), reverse=True,
        unroll=unroll,
    )
    return BackwardResult(duffs, Ks, jnp.sum(dv1), jnp.sum(dv2))


@highest_precision
def backward_pass(problem: Problem, xs: jax.Array, us: jax.Array,
                  config: ILQRConfig = DEFAULT_CONFIG,
                  reg=None) -> BackwardResult:
    """Compute feedforward terms and feedback gains for a trajectory.

    Drop-in equivalent of the reference's public ``backward_pass(x, u, f, L,
    Phi)`` (src/backward_pass.jl:324).  The backward pass quadratizes the
    *raw* (un-offset) running cost, as the reference does
    (src/backward_pass.jl:341) — consistent with the offset running cost in
    the rollout only because ``x_ref`` defaults to zero.

    ``reg`` may be a traced scalar (for adaptive schedules); defaults to the
    static ``config.reg``.
    """

    if reg is None:
        reg = config.reg

    As, Bs = linearize_dynamics(problem.dynamics, xs[:-1], us)
    q, qx, ru, Qxx, Pux, Ruu = quadratize_running_cost(problem.cost, xs[:-1], us)
    qN, qxN, QN = quadratize_final_cost(problem.final_cost, xs[-1])

    if config.backward_backend == "associative":
        from ilqr_tpu.pit import riccati_associative_scan

        return riccati_associative_scan(
            As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
            reg=reg, symmetrize=config.symmetrize,
        )
    return riccati_scan(
        As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
        reg=reg, symmetrize=config.symmetrize, unroll=config.scan_unroll,
    )
