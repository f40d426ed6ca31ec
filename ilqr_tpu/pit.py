"""Parallel-in-time Riccati: log-depth backward pass via associative scan.

The reference's backward pass is strictly sequential in the horizon
(src/backward_pass.jl:339-351) — O(N) depth.  For long horizons (N=1000,
BASELINE.json config 3) this module reformulates the affine-quadratic value
recursion as an *associative* operator and runs it with
``jax.lax.associative_scan`` — O(log N) depth on parallel hardware.  This is
the framework's "sequence parallelism" story (SURVEY.md §2.4: the time
horizon is the analogue of sequence length).

Formulation (after Särkkä & García-Fernández, "Temporal Parallelisation of
Dynamic Programming and Linear Quadratic Control", arXiv:2104.03186):
each timestep becomes an element ``e_k = (A, b, C, eta, J)`` representing
the conditional value function

    V_k(x, z) = 1/2 x^T J x - eta^T x + D_C(z - A x - b),

with ``D_C(d) = 1/2 d^T C^+ d`` the minimal control cost of realizing the
displacement ``d``.  For the general stage cost
``l(x,u) = 1/2 x^T Q x + q^T x + 1/2 u^T R u + r^T u + u^T P x`` (the output
of cost quadratization), completing the square in u gives the element

    A_e   = A - B R^{-1} P
    b_e   = -B R^{-1} r
    C_e   = B R^{-1} B^T
    J_e   = Q - P^T R^{-1} P
    eta_e = -(q - P^T R^{-1} r)

and the terminal element is ``(0, 0, 0, -q_N, Q_N)``.  Combining the suffix
e_k ⊗ … ⊗ e_T yields ``V_k(x) = 1/2 x^T S_k x + s_k^T x + const`` with
``S_k = J`` and ``s_k = -eta``; feedback/feedforward gains are then
recovered pointwise (vmapped over time) with exactly the sequential
formulas (src/backward_pass.jl:177-218).

Regularization caveat: the associative recursion is the *exact* (lambda=0)
Riccati recursion — it needs ``R`` invertible and cannot reproduce the
sequential backend's use of regularized gains *inside* the value recursion
(src/backward_pass.jl:214 feeds H+0.01I gains into step_back).  The
``reg`` parameter here is applied only in the gain extraction.  With
``reg=0`` the two backends agree to roundoff (tested); with ``reg>0`` they
differ by O(reg) — use the sequential backend when bit-parity with the
reference matters, and this one for long-horizon throughput.

Exact regularized mode: the mixed recursion above is the reference's; it is
not the minimization of any stage cost, so no associative form exists for
it.  But the *consistent* regularization (H+reg*I in both the gain solve
and the value update, ``config.reg_in_value=True``) is exactly the
unregularized recursion over stage costs augmented with reg/2*|du|^2 —
which IS associative.  ``riccati_associative_scan(..., reg_in_value=True)``
folds reg into Ruu and matches the sequential consistent-reg backend to
roundoff at any reg (tests/test_pit.py::test_reg_in_value_exact_agreement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqr_tpu.ops.linalg import solve_general_small, solve_psd_small
from ilqr_tpu.precision import highest_precision


def _combine(ei, ej):
    """Associative combination of value elements (ei earlier, ej later)."""

    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)

    def mv(M, v):  # batched matrix-vector
        return jnp.einsum("...ij,...j->...i", M, v)

    # (I + C_i J_j)^{-1} applied from the left.  One unrolled pivoted
    # elimination per combine with the right-hand sides fused into a single
    # augmented block (ilqr_tpu.ops.linalg.solve_general_small) — the
    # library LU (`jnp.linalg.solve`) lowers to serial loops on TPU and
    # would run 5 factorizations where 2 suffice.
    ICJ = I + Ci @ Jj
    rhs1 = jnp.concatenate(
        [Ai, Ci, (bi + mv(Ci, etaj))[..., None]], axis=-1)
    sol1 = solve_general_small(ICJ, rhs1)
    Ai_s = sol1[..., :n]
    Ci_s = sol1[..., n:2 * n]
    bCe_s = sol1[..., 2 * n]

    # Push-through identity: (I + J_j C_i)^{-1} J_j = J_j (I + C_i J_j)^{-1}.
    IJC = I + Jj @ Ci
    rhs2 = jnp.concatenate([Jj, (etaj - mv(Jj, bi))[..., None]], axis=-1)
    sol2 = solve_general_small(IJC, rhs2)
    Jj_s = sol2[..., :n]
    eJb_s = sol2[..., n]

    AiT = jnp.swapaxes(Ai, -1, -2)
    A = Aj @ Ai_s
    b = mv(Aj, bCe_s) + bj
    C = Aj @ Ci_s @ jnp.swapaxes(Aj, -1, -2) + Cj
    eta = mv(AiT, eJb_s) + etai
    J = AiT @ Jj_s @ Ai + Ji
    # Keep the quadratic blocks symmetric against f32 drift.
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return (A, b, C, eta, J)


def _combine_reversed(a, b):
    """Operator as ``lax.associative_scan(..., reverse=True)`` calls it:
    the first argument is the *later* (accumulated-suffix) element, the
    second the *earlier* one — verified empirically; see tests/test_pit.py.
    ``_combine`` wants (earlier, later)."""

    return _combine(b, a)


def value_functions_associative(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN):
    """All value-function pairs ``(S_k [T+1,n,n], s_k [T+1,n])`` in O(log T)
    depth.  Inputs as in :func:`ilqr_tpu.backward.riccati_scan`."""

    T, n = As.shape[0], As.shape[-1]

    Rinv_P = solve_psd_small(Ruu, Pux)                 # [T, m, n]
    Rinv_r = solve_psd_small(Ruu, ru)                  # [T, m]
    Rinv_BT = solve_psd_small(Ruu, jnp.swapaxes(Bs, -1, -2))  # [T, m, n]

    A_e = As - Bs @ Rinv_P
    b_e = -jnp.einsum("tnm,tm->tn", Bs, Rinv_r)
    C_e = Bs @ Rinv_BT
    J_e = Qxx - jnp.swapaxes(Pux, -1, -2) @ Rinv_P
    eta_e = -(qx - jnp.einsum("tmn,tm->tn", Pux, Rinv_r))

    zeros_m = jnp.zeros((1, n, n), dtype=As.dtype)
    A_all = jnp.concatenate([A_e, zeros_m], axis=0)
    b_all = jnp.concatenate([b_e, jnp.zeros((1, n), As.dtype)], axis=0)
    C_all = jnp.concatenate([C_e, zeros_m], axis=0)
    eta_all = jnp.concatenate([eta_e, -qxN[None]], axis=0)
    J_all = jnp.concatenate([J_e, QN[None]], axis=0)

    elems = (A_all, b_all, C_all, eta_all, J_all)
    _, _, _, eta_s, J_s = jax.lax.associative_scan(
        _combine_reversed, elems, reverse=True, axis=0)

    S = J_s                  # [T+1, n, n]
    s_vec = -eta_s           # [T+1, n]
    return S, s_vec


@highest_precision
def riccati_associative_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                             reg, symmetrize=True, reg_in_value=False):
    """Drop-in replacement for :func:`ilqr_tpu.backward.riccati_scan` using
    the parallel-in-time formulation.  See module docstring for the
    regularization caveat.

    With ``reg_in_value=True`` the Tikhonov term is folded into ``Ruu``
    before the elements are built.  Because the local quadratic model is in
    the control *correction* du, adding reg*I to Ruu is exactly adding
    reg/2*|du|^2 to each stage cost (the linear term ``ru`` is unchanged) —
    so the exact associative recursion over the modified cost reproduces the
    sequential consistent-reg recursion (backward.riccati_step with
    reg_in_value=True) to roundoff at any reg, removing the O(reg) caveat.
    """

    from ilqr_tpu.backward import BackwardResult

    if reg_in_value:
        m = Ruu.shape[-1]
        Ruu = Ruu + reg * jnp.eye(m, dtype=Ruu.dtype)
        reg = jnp.zeros((), dtype=Ruu.dtype)

    S, s_vec = value_functions_associative(
        As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN)

    S_next = S[1:]       # [T, n, n] — value at k+1
    s_next = s_vec[1:]   # [T, n]

    # Pointwise gain extraction, vmapped over time — identical algebra to
    # the sequential step (src/backward_pass.jl:177-218).
    def gains(A, B, ru_k, Pux_k, Ruu_k, S1, s1):
        BT_S = B.T @ S1
        g = ru_k + B.T @ s1
        G = Pux_k + BT_S @ A
        H = Ruu_k + BT_S @ B
        m = H.shape[-1]
        H_reg = H + reg * jnp.eye(m, dtype=H.dtype)
        duff = -solve_psd_small(H_reg, g)
        K = -solve_psd_small(H_reg, G)
        return duff, K, duff @ g, 0.5 * duff @ (H @ duff)

    duffs, Ks, dv1, dv2 = jax.vmap(gains)(As, Bs, ru, Pux, Ruu, S_next, s_next)
    return BackwardResult(duffs, Ks, jnp.sum(dv1), jnp.sum(dv2))
