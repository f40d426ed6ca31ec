"""Diagnose the oracle's line-search exhaustion at iteration 16 (ROADMAP #8).

The f64 oracle on the N=900 swing-up finds no improving alpha in 60
halvings at iteration 16.  Question (ROADMAP.md quality #8): does the
reference — which backtracks without bound (src/forward_pass.jl:70-87) and
solves gains with Julia's ``\\`` (LU/Bunch-Kaufman) instead of the oracle's
``np.linalg.solve`` — share the same geometry at that iterate, or does the
factorization choice move it past the stall?

Method: load the frozen exhausted iterate (tests/fixtures/two_link_T900.npz,
the 16-iteration prefix), run one f64 backward pass with the gain solve
done three ways (LAPACK gesv/LU — what the oracle uses and what ``\\``
reduces to for a general square matrix; Cholesky of H+0.01I — what the
compiled solver uses; and an explicit high-precision solve via np.longdouble
elimination), then walk the alpha ladder far past 60 halvings for each,
reporting the best achievable cost delta and the predicted linear decrease
|dV1| against f64 cost resolution eps*|cost|.

Run: python scripts/diag_oracle_exhaustion.py   (CPU, f64; ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
# JAX_PLATFORMS=cpu is ignored in the axon environment — pin the device
# (otherwise every eager derivative call round-trips the TPU tunnel).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np

from tests.oracle import OracleDerivs, oracle_total_cost
from ilqr_tpu.models.two_link import make_two_link_problem


def backward(d, xs, us, reg, solver):
    T = us.shape[0]
    n = xs.shape[1]
    _, s, S = d.quadratize_final(xs[-1])
    duffs = np.zeros_like(us)
    Ks = np.zeros((T, us.shape[1], n))
    dV1 = 0.0
    for t in range(T - 1, -1, -1):
        A, B = d.linearize(xs[t], us[t])
        _, qx, ru, Qxx, Pux, Ruu = d.quadratize(xs[t], us[t])
        g = ru + B.T @ s
        G = Pux + B.T @ S @ A
        H = Ruu + B.T @ S @ B
        Hr = H + reg * np.eye(H.shape[0])
        if solver == "lu":
            duff = -np.linalg.solve(Hr, g)
            K = -np.linalg.solve(Hr, G)
        elif solver == "chol":
            L = np.linalg.cholesky(Hr)
            duff = -np.linalg.solve(L.T, np.linalg.solve(L, g))
            K = -np.linalg.solve(L.T, np.linalg.solve(L, G))
        elif solver == "longdouble":
            Hl = Hr.astype(np.longdouble)
            duff = -np.linalg.solve(Hl.astype(np.float64),
                                    g.astype(np.longdouble).astype(np.float64))
            # 2x2 system: one step of iterative refinement in longdouble.
            r = (Hl @ duff.astype(np.longdouble)
                 + g.astype(np.longdouble)).astype(np.float64)
            duff = duff - np.linalg.solve(Hr, r)
            K = -np.linalg.solve(Hr, G)
        duffs[t] = duff
        Ks[t] = K
        dV1 += duff @ g
        s_new = (qx + A.T @ s + K.T @ (H @ duff) + K.T @ g + G.T @ duff)
        S_new = (Qxx + A.T @ S @ A + K.T @ H @ K + K.T @ G + G.T @ K)
        s, S = s_new, S_new
    return duffs, Ks, dV1


def ladder(d, xs, us, x_traj, duffs, Ks, prev_cost, max_halvings=120):
    best = (np.inf, None)
    alpha = 1.0
    for k in range(max_halvings):
        xs_new = np.zeros_like(xs)
        us_new = np.zeros_like(us)
        xs_new[0] = xs[0]
        for t in range(us.shape[0]):
            us_new[t] = us[t] + alpha * duffs[t] + Ks[t] @ (xs_new[t] - xs[t])
            xs_new[t + 1] = d.f(xs_new[t], us_new[t])
        c = oracle_total_cost(d, xs_new, us_new, x_traj)
        if c < best[0]:
            best = (c, k)
        if c < prev_cost:
            return k, c, best
        alpha /= 2.0
    return None, None, best


def main():
    fx = np.load(os.path.join(os.path.dirname(__file__), "..",
                              "tests", "fixtures", "two_link_T900.npz"))
    xs = np.array(fx["xs_ref"], dtype=np.float64)
    us = np.array(fx["us_ref"], dtype=np.float64)
    problem = make_two_link_problem()
    d = OracleDerivs(problem.dynamics, problem.cost, problem.final_cost)
    x_traj = np.zeros_like(xs)
    cost = oracle_total_cost(d, xs, us, x_traj)
    eps_res = np.finfo(np.float64).eps * abs(cost)
    print(f"iterate cost            : {cost:.17g}")
    print(f"f64 cost resolution     : {eps_res:.3g}  (eps * |cost|)")

    for solver in ("lu", "chol", "longdouble"):
        duffs, Ks, dV1 = backward(d, xs, us, reg=0.01, solver=solver)
        k, c, best = ladder(d, xs, us, x_traj, duffs, Ks, cost)
        tag = f"[{solver:10s}] |dV1|={abs(dV1):.3g}"
        if k is None:
            print(f"{tag}  NO improving alpha in 120 halvings; "
                  f"best delta {best[0] - cost:+.3g} at 2^-{best[1]}")
        else:
            print(f"{tag}  improved at alpha=2^-{k}: delta {c - cost:+.3g}")
    print()
    print("Interpretation: if |dV1| is at or below the f64 cost resolution")
    print("for every factorization, the stall is the GEOMETRY of the")
    print("iterate (predicted decrease unresolvable in f64), not the")
    print("LU-vs-Cholesky choice — the reference's unbounded backtracking")
    print("(src/forward_pass.jl:70-87) would halve alpha forever here.")


if __name__ == "__main__":
    main()
