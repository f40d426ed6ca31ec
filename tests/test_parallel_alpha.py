"""Parallel-alpha line search (``config.parallel_alpha_block``).

Evaluating R ladder rungs as extra batch lanes in one rollout must make
EXACTLY the decisions the sequential ladder makes — same accepted alphas,
same trajectories, same statuses — for every acceptance mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.batched import batched_solve_fused
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout


def _setup(B=6, T=40, dtype=jnp.float32):
    problem = make_two_link_problem()
    key = jax.random.PRNGKey(0)
    nominal = jnp.asarray([0.3, 0.7, 0.2, 0.5], dtype)
    x0s = nominal + 0.2 * jax.random.normal(key, (B, 4), dtype)
    us0 = jnp.zeros((B, T, 2), dtype)
    roll = jax.vmap(lambda a, b: rollout(problem.dynamics, a, b))
    return problem, roll(x0s, us0), us0


@pytest.mark.parametrize("mode", ["plain", "exact", "ratio", "ratio_exact"])
@pytest.mark.parametrize("R", [4, 8])
def test_parallel_alpha_matches_sequential(mode, R):
    problem, xs0, us0 = _setup()
    kw = dict(max_iter=25, tol=1e-6, tol_grad=0.0, tol_grad_rel=0.0,
              adaptive_reg=True, reg_backtrack_trigger=1)
    if "exact" in mode:
        kw["exact_ls_delta"] = True
    if "ratio" in mode:
        kw.update(ls_expected_decrease=True, ls_c=0.3)

    r_seq = batched_solve_fused(problem, xs0, us0,
                                config=ILQRConfig(**kw))
    r_par = batched_solve_fused(
        problem, xs0, us0,
        config=ILQRConfig(parallel_alpha_block=R, **kw))

    np.testing.assert_array_equal(np.asarray(r_par.status),
                                  np.asarray(r_seq.status))
    np.testing.assert_array_equal(np.asarray(r_par.iterations),
                                  np.asarray(r_seq.iterations))
    np.testing.assert_array_equal(np.asarray(r_par.alpha),
                                  np.asarray(r_seq.alpha))
    np.testing.assert_array_equal(np.asarray(r_par.us),
                                  np.asarray(r_seq.us))
    np.testing.assert_array_equal(np.asarray(r_par.xs),
                                  np.asarray(r_seq.xs))


def test_parallel_alpha_deep_backtrack_parity():
    """Lanes that need rungs beyond the first block (alpha < 2^-R) get the
    same alpha as the sequential ladder; ladder exhaustion is identical."""

    problem, xs0, us0 = _setup(B=4, T=30)
    # A large reg makes early steps poor -> deep backtracks on some lanes.
    kw = dict(max_iter=6, tol=1e-8, tol_grad=0.0, tol_grad_rel=0.0,
              reg=1e3, max_backtracks=11)
    r_seq = batched_solve_fused(problem, xs0, us0, config=ILQRConfig(**kw))
    r_par = batched_solve_fused(
        problem, xs0, us0, config=ILQRConfig(parallel_alpha_block=4, **kw))
    np.testing.assert_array_equal(np.asarray(r_par.status),
                                  np.asarray(r_seq.status))
    np.testing.assert_array_equal(np.asarray(r_par.alpha),
                                  np.asarray(r_seq.alpha))
    np.testing.assert_array_equal(np.asarray(r_par.us),
                                  np.asarray(r_seq.us))
