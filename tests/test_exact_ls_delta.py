"""High-resolution line-search acceptance (``config.exact_ls_delta``).

The acceptance condition is unchanged — "new cost < previous cost"
(src/forward_pass.jl:79) — but evaluated as a sum of per-timestep cost
differences.  Nearby per-step costs subtract exactly (Sterbenz), so true
decreases far below the rounded-total resolution eps*total become
certifiable.  These tests build a problem whose per-iteration decreases
sit exactly in that gap: a huge constant cost offset (the analogue of the
RBD problem's ~1e8 cost scale) over a mildly nonlinear scalar plant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.parallel.batching import batch_solve
from ilqr_tpu.batched import batched_solve_fused
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import solve


def _floor_problem(C=1e6):
    """Cost offset C per step makes eps_f32 * total ~ 8 while the solver's
    per-iteration decreases shrink geometrically below it; the tanh term
    keeps iLQR from converging in one exact-Newton step."""

    def dynamics(x, u):
        return 0.9 * x + u + 0.05 * jnp.tanh(x)

    def cost(x, u):
        return C + jnp.sum(x * x) + jnp.sum(u * u)

    def final_cost(x):
        return jnp.sum(x * x)

    return Problem(dynamics=dynamics, cost=cost, final_cost=final_cost,
                   state_dim=1, control_dim=1, name="floor")


def _initial(T=64, dtype=jnp.float32):
    x0 = jnp.asarray([1.0], dtype)
    us0 = jnp.zeros((T, 1), dtype)
    return x0, us0


def test_exact_delta_resolves_below_f32_floor():
    problem = _floor_problem()
    x0, us0 = _initial()
    xs0 = rollout(problem.dynamics, x0, us0)

    base = dict(max_iter=40, tol=1e-8, tol_grad=0.0, tol_grad_rel=0.0)
    r_rounded = solve(problem, xs0, us0,
                      config=ILQRConfig(**base))
    r_exact = solve(problem, xs0, us0,
                    config=ILQRConfig(exact_ls_delta=True, **base))

    # The rounded-total comparison cannot certify the shrinking decreases
    # against the ~6.4e7 total and fails the line search before du_sq
    # reaches tol; the differenced test keeps accepting and converges.
    assert int(r_rounded.status) == int(Status.LINESEARCH_FAILED), (
        int(r_rounded.status), float(r_rounded.du_sq))
    assert int(r_exact.status) == int(Status.CONVERGED), (
        int(r_exact.status), float(r_exact.du_sq))
    assert float(r_exact.du_sq) <= 1e-8


def test_exact_delta_engines_agree():
    """Fused batch-last and vmapped per-scenario engines make identical
    decisions with the flag on."""

    problem = _floor_problem()
    x0, us0 = _initial()
    B = 4
    key = jax.random.PRNGKey(0)
    x0s = x0[None, :] + 0.1 * jax.random.normal(key, (B, 1), jnp.float32)
    us0s = jnp.tile(us0[None], (B, 1, 1))
    config = ILQRConfig(max_iter=40, tol=1e-8, tol_grad=0.0,
                        tol_grad_rel=0.0, exact_ls_delta=True)

    r_vmap = batch_solve(problem, x0s, us0s, config=config)
    roll = jax.vmap(lambda a, b: rollout(problem.dynamics, a, b))
    r_fused = batched_solve_fused(problem, roll(x0s, us0s), us0s,
                                  config=config)
    np.testing.assert_array_equal(np.asarray(r_vmap.status),
                                  np.asarray(r_fused.status))
    np.testing.assert_allclose(np.asarray(r_vmap.us),
                               np.asarray(r_fused.us), rtol=1e-6, atol=1e-7)
    assert np.all(np.asarray(r_fused.status) == int(Status.CONVERGED))


def test_zero_step_accepted_as_converging():
    """A candidate identical to the iterate (duff underflowed the update in
    f32: u + duff == u, delta == 0 exactly) is ACCEPTED under
    exact_ls_delta when its control change is <= tol — it is precisely the
    step the reference's convergence test sum((du)^2) <= tol fires on
    (src/forward_pass.jl:171).  Strict decrease would reject it forever.
    Measured on hardware: 204/4096 strict-mode lanes end in this state
    (scripts/diag_strict.py, BENCH.md round 4)."""

    from ilqr_tpu.forward import forward_pass
    from ilqr_tpu.problem import total_cost

    problem = make_two_link_problem()
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], jnp.float32)
    us = jnp.zeros((20, 2), jnp.float32)
    xs = rollout(problem.dynamics, x0, us)
    prev_cost = total_cost(problem, xs, us).astype(jnp.float32)
    duffs = jnp.zeros_like(us)
    Ks = jnp.zeros((20, 2, 4), jnp.float32)

    base = dict(max_iter=10, tol=1e-6, tol_grad=0.0, tol_grad_rel=0.0)
    r_exact = forward_pass(problem, xs, us, duffs, Ks, prev_cost,
                           config=ILQRConfig(exact_ls_delta=True, **base))
    assert bool(r_exact.accepted)
    assert float(r_exact.alpha) == 1.0
    np.testing.assert_array_equal(np.asarray(r_exact.us), np.asarray(us))

    r_rounded = forward_pass(problem, xs, us, duffs, Ks, prev_cost,
                             config=ILQRConfig(**base))
    assert not bool(r_rounded.accepted)

    # Fused engine: same decision, per lane.
    from ilqr_tpu.batched import forward_pass_bl, total_cost_bl

    xs_bl = jnp.moveaxis(jnp.tile(xs[None], (3, 1, 1)), 0, -1)
    us_bl = jnp.moveaxis(jnp.tile(us[None], (3, 1, 1)), 0, -1)
    duffs_bl = jnp.zeros_like(us_bl)
    Ks_bl = jnp.zeros((20, 2, 4, 3), jnp.float32)
    pc_bl = total_cost_bl(problem, xs_bl, us_bl).astype(jnp.float32)
    out = forward_pass_bl(problem, xs_bl, us_bl, duffs_bl, Ks_bl, pc_bl,
                          config=ILQRConfig(exact_ls_delta=True, **base))
    assert bool(jnp.all(out[3]))  # accepted


def test_uphill_step_rejected():
    """The converging-step rule requires a BITWISE-identical candidate: an
    uphill duff whose candidates genuinely move the controls (and
    resolvably increase the cost) is rejected at every rung the ladder
    tries — it never triggers the zero-step acceptance."""

    from ilqr_tpu.forward import forward_pass
    from ilqr_tpu.problem import total_cost

    def dynamics(x, u):
        return 0.9 * x + u

    def cost(x, u):
        return jnp.sum(x * x) + jnp.sum(u * u)

    def final_cost(x):
        return jnp.sum(x * x)

    problem = Problem(dynamics=dynamics, cost=cost, final_cost=final_cost,
                      state_dim=1, control_dim=1, name="uphill")
    x0 = jnp.asarray([1.0], jnp.float32)
    us = jnp.zeros((8, 1), jnp.float32)
    xs = rollout(problem.dynamics, x0, us)
    prev_cost = total_cost(problem, xs, us).astype(jnp.float32)
    # Pushing the controls away from 0 strictly increases both the u^2
    # term and the tracking cost (states grow): uphill at every alpha the
    # bounded ladder reaches (alpha >= 2^-7 here, all well resolved).
    duffs = jnp.full_like(us, 1.0)
    Ks = jnp.zeros((8, 1, 1), jnp.float32)
    r = forward_pass(problem, xs, us, duffs, Ks, prev_cost,
                     config=ILQRConfig(max_iter=10, tol=1e-6, tol_grad=0.0,
                                       tol_grad_rel=0.0, max_backtracks=8,
                                       exact_ls_delta=True))
    assert not bool(r.accepted)
    assert int(r.backtracks) == 8


def test_exact_delta_identical_when_resolved():
    """On a well-conditioned problem (f64 two-link) the differenced test
    makes exactly the decisions the rounded test makes — same iterates,
    same statuses, same iteration counts."""

    problem = make_two_link_problem()
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], jnp.float64)
    us0 = jnp.zeros((30, 2), jnp.float64)
    xs0 = rollout(problem.dynamics, x0, us0)
    base = dict(max_iter=25, tol=1e-6)
    r0 = solve(problem, xs0, us0, config=ILQRConfig(**base))
    r1 = solve(problem, xs0, us0,
               config=ILQRConfig(exact_ls_delta=True, **base))
    assert int(r0.status) == int(r1.status)
    assert int(r0.iterations) == int(r1.iterations)
    np.testing.assert_allclose(np.asarray(r0.us), np.asarray(r1.us),
                               rtol=1e-12, atol=1e-12)
