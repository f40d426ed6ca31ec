"""Pure-NumPy oracle mirroring the Julia reference's exact semantics.

An independent, deliberately slow and serial implementation of the iLQR
algorithm as the reference computes it (float64, per-step finite
ForwardDiff-style derivatives replaced by numerically exact closed-form
autodiff via numpy finite differences would be too loose — instead we use
the same math with numpy and derivatives supplied by the caller or by
central finite differences of high order where needed).

Used as the trusted ``u_ref`` for the parity target
``|u - u_ref|_inf < 1e-3`` (BASELINE.md) without a Julia runtime.

Semantics mirrored from the reference:

* backward recursion: src/backward_pass.jl:177-186, 207-218, 262-273,
  324-357 (H regularized by +0.01 I for the gain solves only);
* forward pass: first alpha in 1, 1/2, 1/4, ... with any cost decrease
  (src/forward_pass.jl:55-93);
* fit loop: prev_cost = Inf, convergence sum((du)^2) <= tol, returning the
  *pre-update* trajectory on the converging iteration
  (src/forward_pass.jl:148-179);
* total cost offsets the running-cost state by x_traj
  (src/forward_pass.jl:182-196).

Derivatives: the oracle takes callables built on jax in float64 (evaluated
eagerly, outside any jit) purely as a derivative oracle — the solver logic
itself is plain Python/NumPy and shares no code with ilqr_tpu's compiled
path.
"""

from __future__ import annotations

import numpy as np


class OracleDerivs:
    """Derivative oracle built from jax (float64, eager) for the numpy solver."""

    def __init__(self, dynamics, cost, final_cost):
        import jax

        assert jax.config.jax_enable_x64
        jf = jax.jit(dynamics)
        jL = jax.jit(cost)
        jPhi = jax.jit(final_cost)
        self.f = lambda x, u: np.asarray(jf(x, u))
        self.L = lambda x, u: float(jL(x, u))
        self.Phi = lambda x: float(jPhi(x))
        self._A = jax.jit(jax.jacfwd(dynamics, argnums=0))
        self._B = jax.jit(jax.jacfwd(dynamics, argnums=1))
        gx = jax.grad(cost, argnums=0)
        gu = jax.grad(cost, argnums=1)
        self._qx = jax.jit(gx)
        self._ru = jax.jit(gu)
        self._Qxx = jax.jit(jax.jacfwd(gx, argnums=0))
        self._Pux = jax.jit(jax.jacfwd(gu, argnums=0))
        self._Ruu = jax.jit(jax.jacfwd(gu, argnums=1))
        self._phix = jax.jit(jax.grad(final_cost))
        self._Phixx = jax.jit(jax.jacfwd(jax.grad(final_cost)))

    def linearize(self, x, u):
        return np.asarray(self._A(x, u)), np.asarray(self._B(x, u))

    def quadratize(self, x, u):
        return (
            self.L(x, u),
            np.asarray(self._qx(x, u)),
            np.asarray(self._ru(x, u)),
            np.asarray(self._Qxx(x, u)),
            np.asarray(self._Pux(x, u)),
            np.asarray(self._Ruu(x, u)),
        )

    def quadratize_final(self, x):
        return self.Phi(x), np.asarray(self._phix(x)), np.asarray(self._Phixx(x))


def oracle_total_cost(d: OracleDerivs, xs, us, x_traj):
    total = 0.0
    for i in range(us.shape[0]):
        total += d.L(xs[i] - x_traj[i], us[i])
    return total + d.Phi(xs[-1])


def oracle_backward(d: OracleDerivs, xs, us, reg=0.01):
    T, m = us.shape
    n = xs.shape[1]
    duffs = np.zeros((T, m))
    Ks = np.zeros((T, m, n))
    s, s_vec, S = d.quadratize_final(xs[-1])
    for i in range(T - 1, -1, -1):
        A, B = d.linearize(xs[i], us[i])
        q, qx, ru, Qxx, Pux, Ruu = d.quadratize(xs[i], us[i])
        g = ru + B.T @ s_vec
        G = Pux + B.T @ S @ A
        H = Ruu + B.T @ S @ B
        H_reg = H + reg * np.eye(m)
        duff = -np.linalg.solve(H_reg, g)
        K = -np.linalg.solve(H_reg, G)
        duffs[i] = duff
        Ks[i] = K
        s_new = q + s + 0.5 * duff @ H @ duff + duff @ g
        s_vec_new = qx + A.T @ s_vec + K.T @ H @ duff + K.T @ g + G.T @ duff
        S_new = Qxx + A.T @ S @ A + K.T @ H @ K + K.T @ G + G.T @ K
        s, s_vec, S = s_new, s_vec_new, S_new
    return duffs, Ks


def oracle_forward(d: OracleDerivs, xs, us, x_traj, duffs, Ks, prev_cost,
                   max_backtracks=60):
    T = us.shape[0]
    alpha = 1.0
    for _ in range(max_backtracks):
        xs_new = np.zeros_like(xs)
        us_new = np.zeros_like(us)
        xs_new[0] = xs[0]
        for k in range(T):
            dx = xs_new[k] - xs[k]
            us_new[k] = us[k] + alpha * duffs[k] + Ks[k] @ dx
            xs_new[k + 1] = d.f(xs_new[k], us_new[k])
        new_cost = oracle_total_cost(d, xs_new, us_new, x_traj)
        if prev_cost - new_cost > 0:
            return xs_new, us_new, new_cost, alpha
        alpha /= 2.0
    # No improving alpha: the iterate is optimal to working (f64)
    # precision.  The reference would spin forever here
    # (src/forward_pass.jl:70-87); the oracle reports it instead.
    return None


def oracle_fit(dynamics, cost, final_cost, x_init, u_init, x_traj=None,
               max_iter=100, tol=1e-6, reg=0.01, verbose_every=0):
    d = OracleDerivs(dynamics, cost, final_cost)
    xs = np.array(x_init, dtype=np.float64)
    us = np.array(u_init, dtype=np.float64)
    if x_traj is None:
        x_traj = np.zeros_like(xs)
    prev_cost = np.inf
    iters = 0
    for _ in range(int(max_iter)):
        duffs, Ks = oracle_backward(d, xs, us, reg=reg)
        fwd = oracle_forward(d, xs, us, x_traj, duffs, Ks, prev_cost)
        if fwd is None:
            # Line-search exhaustion: optimal to f64 resolution; return the
            # current iterate without counting the failed iteration.
            break
        xs_new, us_new, new_cost, _alpha = fwd
        assert prev_cost > new_cost
        prev_cost = new_cost
        iters += 1
        if verbose_every and iters % verbose_every == 0:
            print(f"oracle iter {iters}: cost {new_cost:.9g}", flush=True)
        if np.sum((us_new - us) ** 2) <= tol:
            # Reference returns the pre-update trajectory here
            # (break before the update, src/forward_pass.jl:171-175).
            break
        xs, us = xs_new, us_new
    return xs, us, prev_cost, iters
