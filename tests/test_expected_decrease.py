"""Expected-decrease line-search acceptance (``config.ls_expected_decrease``).

Tassa, Erez & Todorov (IROS 2012, sec. II-F): accept a rung only when the
achieved decrease is at least ``ls_c`` of the backward pass's prediction
``-(alpha dV1 + alpha^2 dV2)``.  Default-off; the reference-faithful
any-decrease rule (src/forward_pass.jl:79) is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.batched import batched_solve_fused
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.forward import forward_pass
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import Problem, rollout, total_cost
from ilqr_tpu.solver import solve


def test_ratio_test_rejects_poor_rung():
    """A rung achieving far less than the predicted decrease is rejected
    under the ratio test but accepted under any-decrease."""

    # Linear plant, quadratic cost: predictions are exact for the TRUE
    # duff.  Feed a deliberately bad duff (tiny actual improvement) with
    # an inflated dV1 prediction: any-decrease accepts, ratio rejects.
    def dynamics(x, u):
        return 0.9 * x + u

    def cost(x, u):
        return jnp.sum(x * x) + jnp.sum(u * u)

    def final_cost(x):
        return jnp.sum(x * x)

    problem = Problem(dynamics=dynamics, cost=cost, final_cost=final_cost,
                      state_dim=1, control_dim=1, name="lq")
    x0 = jnp.asarray([1.0], jnp.float64)
    us = jnp.zeros((8, 1), jnp.float64)
    xs = rollout(problem.dynamics, x0, us)
    prev_cost = total_cost(problem, xs, us)
    # A tiny step in the right direction: improves the cost a little.
    duffs = jnp.full_like(us, -1e-4)
    Ks = jnp.zeros((8, 1, 1), jnp.float64)
    # Claim a large predicted decrease; achieved/predicted ~ 1e-3 << 0.1.
    dV1 = jnp.asarray(-1.0, jnp.float64)
    dV2 = jnp.asarray(0.5, jnp.float64)

    base = dict(max_iter=10, tol=1e-10, tol_grad=0.0, tol_grad_rel=0.0,
                max_backtracks=4)
    r_any = forward_pass(problem, xs, us, duffs, Ks, prev_cost,
                         config=ILQRConfig(**base), dV1=dV1, dV2=dV2)
    assert bool(r_any.accepted) and float(r_any.alpha) == 1.0

    r_ratio = forward_pass(
        problem, xs, us, duffs, Ks, prev_cost,
        config=ILQRConfig(ls_expected_decrease=True, ls_c=0.1, **base),
        dV1=dV1, dV2=dV2)
    assert not bool(r_ratio.accepted)


def test_expected_decrease_converges_two_link():
    """With the TRUE backward-pass predictions, near-alpha=1 steps satisfy
    the ratio test, so the full solver still converges on the two-link
    problem — and to the same optimum as the any-decrease mode."""

    problem = make_two_link_problem()
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], jnp.float64)
    us0 = jnp.zeros((60, 2), jnp.float64)
    xs0 = rollout(problem.dynamics, x0, us0)
    base = dict(max_iter=60, tol=1e-10, adaptive_reg=True,
                reg_backtrack_trigger=1)
    r_any = solve(problem, xs0, us0, config=ILQRConfig(**base))
    r_exp = solve(problem, xs0, us0,
                  config=ILQRConfig(ls_expected_decrease=True, ls_c=0.1,
                                    **base))
    assert int(r_any.status) == int(Status.CONVERGED)
    assert int(r_exp.status) == int(Status.CONVERGED)
    np.testing.assert_allclose(float(r_exp.cost), float(r_any.cost),
                               rtol=1e-8)


def test_expected_decrease_batched_engine():
    """The fused batch-last engine honors the flag (per-lane dV1/dV2)."""

    problem = make_two_link_problem()
    B = 4
    key = jax.random.PRNGKey(0)
    x0s = (jnp.asarray([0.1, -0.1, 0.0, 0.0], jnp.float32)
           + 0.05 * jax.random.normal(key, (B, 4), jnp.float32))
    us0 = jnp.zeros((B, 40, 2), jnp.float32)
    roll = jax.vmap(lambda a, b: rollout(problem.dynamics, a, b))
    # exact_ls_delta pairs with the ratio test: in f32 a lane at the
    # optimum underflows the update (du_sq == 0 here) and only the
    # converging-step rule can certify it.
    config = ILQRConfig(max_iter=40, tol=1e-6, ls_expected_decrease=True,
                        ls_c=0.1, adaptive_reg=True, reg_backtrack_trigger=1,
                        exact_ls_delta=True)
    r = batched_solve_fused(problem, roll(x0s, us0), us0, config=config)
    assert np.all(np.asarray(r.status) == int(Status.CONVERGED)), (
        np.asarray(r.status), np.asarray(r.du_sq))
