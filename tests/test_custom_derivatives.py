"""User-supplied analytic derivative overrides on Problem.

Framework extension (the reference always re-derives with ForwardDiff,
src/backward_pass.jl:25-153): a Problem may carry ``dynamics_jacobians``,
``cost_quadratization``, and ``final_cost_quadratization`` callables that
the solver uses instead of autodiff, in both the per-scenario and the
fused batch-last engines.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.backward import backward_pass
from ilqr_tpu.batched import batched_solve_fused
from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import solve

_A = jnp.asarray([[1.0, 0.1], [-0.05, 0.97]])
_B = jnp.asarray([[0.0], [0.1]])
_Q = jnp.diag(jnp.asarray([1.0, 0.4]))
_R = jnp.asarray([[0.2]])


def _lqr_problem(with_overrides: bool) -> Problem:
    def dynamics(x, u):
        return _A @ x + _B @ u

    def cost(x, u):
        return 0.5 * (x @ _Q @ x + u @ _R @ u)

    def final_cost(x):
        return 0.5 * (x @ _Q @ x)

    kw = {}
    if with_overrides:
        kw = dict(
            dynamics_jacobians=lambda x, u: (_A, _B),
            cost_quadratization=lambda x, u: (
                0.5 * (x @ _Q @ x + u @ _R @ u), _Q @ x, _R @ u,
                _Q, jnp.zeros((1, 2)), _R),
            final_cost_quadratization=lambda x: (
                0.5 * (x @ _Q @ x), _Q @ x, _Q),
        )
    return Problem(dynamics=dynamics, cost=cost, final_cost=final_cost,
                   state_dim=2, control_dim=1, name="lqr", **kw)


def _traj(T=25):
    x0 = jnp.asarray([1.0, -0.5])
    us = 0.1 * jnp.sin(jnp.arange(T, dtype=jnp.float64))[:, None]
    p = _lqr_problem(False)
    xs = rollout(p.dynamics, x0, us)
    return xs, us


def test_overrides_match_autodiff_backward_pass():
    xs, us = _traj()
    cfg = ILQRConfig()
    bwd_ad = backward_pass(_lqr_problem(False), xs, us, cfg)
    bwd_an = backward_pass(_lqr_problem(True), xs, us, cfg)
    np.testing.assert_allclose(np.asarray(bwd_an.duffs),
                               np.asarray(bwd_ad.duffs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bwd_an.Ks),
                               np.asarray(bwd_ad.Ks), atol=1e-12)


def test_overrides_match_autodiff_full_solve():
    xs, us = _traj()
    cfg = ILQRConfig(max_iter=20, tol=1e-12)
    r_ad = solve(_lqr_problem(False), xs, us, config=cfg)
    r_an = solve(_lqr_problem(True), xs, us, config=cfg)
    np.testing.assert_allclose(np.asarray(r_an.us), np.asarray(r_ad.us),
                               atol=1e-12)
    assert int(r_an.status) == int(r_ad.status)


def test_overrides_match_in_fused_engine():
    xs, us = _traj()
    cfg = ILQRConfig(max_iter=20, tol=1e-12)
    r_ad = batched_solve_fused(_lqr_problem(False), xs[None], us[None],
                               config=cfg)
    r_an = batched_solve_fused(_lqr_problem(True), xs[None], us[None],
                               config=cfg)
    np.testing.assert_allclose(np.asarray(r_an.us), np.asarray(r_ad.us),
                               atol=1e-12)


def test_overrides_are_actually_used():
    """A deliberately wrong Jacobian override must change the gains —
    proving the solver consumes the override rather than silently
    re-deriving."""

    xs, us = _traj()
    cfg = ILQRConfig()
    p_bad = Problem(
        dynamics=_lqr_problem(False).dynamics,
        cost=_lqr_problem(False).cost,
        final_cost=_lqr_problem(False).final_cost,
        dynamics_jacobians=lambda x, u: (2.0 * _A, _B),
        name="lqr-bad",
    )
    bwd_good = backward_pass(_lqr_problem(False), xs, us, cfg)
    bwd_bad = backward_pass(p_bad, xs, us, cfg)
    assert float(jnp.max(jnp.abs(bwd_bad.Ks - bwd_good.Ks))) > 1e-3
