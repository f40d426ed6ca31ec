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
    problem_linearize,
    problem_quadratize_final,
    problem_quadratize_running,
    quadratize_final_cost,
    quadratize_running_cost,
)
from ilqr_tpu.ops.linalg import solve_psd_small
from ilqr_tpu.ops import smallmat as sm
from ilqr_tpu.precision import highest_precision
from ilqr_tpu.problem import Problem


class BackwardResult(NamedTuple):
    duffs: jax.Array  # [T, m] feedforward terms
    Ks: jax.Array     # [T, m, n] feedback gains
    dV1: jax.Array    # scalar: sum_t duff_t . g_t   (expected linear decrease)
    dV2: jax.Array    # scalar: sum_t 0.5 duff_t . H_t duff_t


def riccati_step(carry, inp, reg, symmetrize, reg_in_value=False):
    """One backward value-recursion step (pure linear algebra).

    ``carry = (s, s_vec [n], S [n, n])`` is the quadratic value model at
    t+1; ``inp = (A, B, q, qx, ru, Qxx, Pux, Ruu)`` the local model at t.

    ``reg_in_value=False`` (default) replicates the reference's mixed
    semantics: gains from H + reg*I, value update with the raw H
    (src/backward_pass.jl:207-218 vs :262-273).  ``True`` uses H + reg*I
    consistently in both — equivalent to adding reg/2*|du|^2 to the stage
    cost, which makes the recursion an exact Riccati recursion (and hence
    expressible associatively; see ilqr_tpu.pit).
    """

    s, s_vec, S = carry
    if len(inp) == 9:
        # DDP: contract the second-order dynamics tensor with the value
        # gradient at t+1 and fold it into the cost curvature blocks
        # (framework extension — the reference is pure iLQR).
        A, B, q, qx, ru, Qxx, Pux, Ruu, Fzz = inp
        n = A.shape[-1]
        Vf = jnp.einsum("k,kij->ij", s_vec, Fzz)
        Qxx = Qxx + Vf[..., :n, :n]
        Pux = Pux + Vf[..., n:, :n]
        Ruu = Ruu + Vf[..., n:, n:]
    else:
        A, B, q, qx, ru, Qxx, Pux, Ruu = inp

    # All products go through ops.smallmat: broadcast-multiply-reduce VPU
    # contractions instead of MXU dot_generals — n, m are tiny, and under
    # vmap each scalar of the n^3 loops becomes one batch-wide vector op at
    # exact f32 (no bf16 MXU passes).
    BT_S = sm.mtm(B, S)
    g = ru + sm.mtv(B, s_vec)                 # Qu
    G = Pux + sm.mm(BT_S, A)                  # Qux  [m, n]
    H = Ruu + sm.mm(BT_S, B)                  # Quu  [m, m]

    m = H.shape[-1]
    H_reg = H + reg * jnp.eye(m, dtype=H.dtype)
    duff = -solve_psd_small(H_reg, g)
    K = -solve_psd_small(H_reg, G)

    if reg_in_value:
        H = H_reg
    H_duff = sm.mv(H, duff)
    s_new = q + s + 0.5 * sm.vv(duff, H_duff) + sm.vv(duff, g)
    s_vec_new = (qx + sm.mtv(A, s_vec) + sm.mtv(K, H_duff) + sm.mtv(K, g)
                 + sm.mtv(G, duff))
    KtG = sm.mtm(K, G)
    S_new = (Qxx + sm.mtm(A, sm.mm(S, A)) + sm.mtm(K, sm.mm(H, K))
             + KtG + jnp.swapaxes(KtG, -1, -2))
    if symmetrize:
        S_new = 0.5 * (S_new + jnp.swapaxes(S_new, -1, -2))

    out = (duff, K, sm.vv(duff, g), 0.5 * sm.vv(duff, H_duff))
    return (s_new, s_vec_new, S_new), out


@highest_precision
def riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                 reg, symmetrize=True, unroll=1, reg_in_value=False,
                 Fzz=None):
    """Whole-horizon backward recursion over precomputed local models.

    Inputs are time-major ``[T, ...]``; the scan runs t = T-1 … 0
    (``reverse=True``) seeded from the terminal quadratization
    (src/backward_pass.jl:335-336).  Returns ``BackwardResult``.
    """

    def step(carry, inp):
        return riccati_step(carry, inp, reg=reg, symmetrize=symmetrize,
                            reg_in_value=reg_in_value)

    init = (qN, qxN, QN)
    xs_in = (As, Bs, q, qx, ru, Qxx, Pux, Ruu)
    if Fzz is not None:
        xs_in = xs_in + (Fzz,)
    _, (duffs, Ks, dv1, dv2) = jax.lax.scan(
        step, init, xs_in, reverse=True, unroll=unroll,
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

    As, Bs = problem_linearize(problem, xs[:-1], us)
    q, qx, ru, Qxx, Pux, Ruu = problem_quadratize_running(problem, xs[:-1], us)
    qN, qxN, QN = problem_quadratize_final(problem, xs[-1])

    if config.backward_backend == "associative":
        from ilqr_tpu.pit import riccati_associative_scan

        return riccati_associative_scan(
            As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
            reg=reg, symmetrize=config.symmetrize,
            reg_in_value=config.reg_in_value,
        )
    if config.backward_backend == "pallas":
        from ilqr_tpu.ops.riccati_dispatch import (
            make_riccati_op, pallas_interpret_default)

        op = make_riccati_op(config.symmetrize, config.scan_unroll,
                             pallas_interpret_default())
        duffs, Ks, dv1, dv2 = op(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN,
                                 jnp.asarray(reg, As.dtype))
        return BackwardResult(duffs, Ks, dv1, dv2)
    Fzz = None
    if config.ddp:
        from ilqr_tpu.derivatives import problem_dynamics_hessians

        Fzz = problem_dynamics_hessians(problem, xs[:-1], us)
    return riccati_scan(
        As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
        reg=reg, symmetrize=config.symmetrize, unroll=config.scan_unroll,
        reg_in_value=config.reg_in_value, Fzz=Fzz,
    )
