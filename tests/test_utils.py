"""Metrics trace, checkpointing, and cost-library tests."""

import os

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.costs import (
    add_costs,
    effort_cost,
    quadratic_final_cost,
    quadratic_tracking_cost,
    workspace_target_final_cost,
)
from ilqr_tpu.models.two_link import (
    TwoLinkParams,
    forward_kinematics,
    make_two_link_problem,
)
from ilqr_tpu.problem import Problem, rollout
from ilqr_tpu.solver import solve
from ilqr_tpu.utils.checkpoint import load_solver_state, save_solver_state
from ilqr_tpu.utils.metrics import solve_with_trace


def test_trace_matches_solver_result():
    problem = make_two_link_problem()
    T = 20
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, x0, us0)
    config = ILQRConfig(max_iter=30, tol=1e-6)

    plain = solve(problem, xs0, us0, config=config)
    traced, trace = solve_with_trace(problem, xs0, us0, config=config)

    np.testing.assert_allclose(np.asarray(traced.us), np.asarray(plain.us),
                               atol=1e-12)
    assert int(traced.iterations) == int(plain.iterations)
    assert int(traced.status) == int(plain.status)
    n = int(traced.iterations)
    valid = np.asarray(trace.valid)
    assert valid[:n].all() and not valid[n:].any()
    # Costs decrease monotonically over the valid iterations (the property
    # the reference asserts per-iteration, src/forward_pass.jl:168).
    costs = np.asarray(trace.cost)[:n]
    assert (np.diff(costs) <= 0).all()


def test_trace_agrees_with_solver_under_tol_grad_rel():
    """The traced solver runs the SAME step body as ``solve`` — a config
    that converges via the relative-gradient stationarity test must report
    CONVERGED in both (this drifted in round 1: the trace loop lost the
    tol_grad_rel test and reported LINESEARCH_FAILED)."""

    problem = make_two_link_problem()
    T = 40
    x0 = jnp.asarray([0.3, 0.7, 0.2, 0.5], jnp.float32)
    us0 = jnp.zeros((T, 2), jnp.float32)
    xs0 = rollout(problem.dynamics, x0, us0).astype(jnp.float32)

    config = ILQRConfig(max_iter=200, tol=0.0, tol_grad=0.0,
                        tol_grad_rel=1e-5)
    plain = solve(problem, xs0, us0, config=config)
    traced, trace = solve_with_trace(problem, xs0, us0, config=config)

    assert int(plain.status) == int(Status.CONVERGED)
    assert int(traced.status) == int(plain.status)
    assert int(traced.iterations) == int(plain.iterations)
    np.testing.assert_allclose(np.asarray(traced.us), np.asarray(plain.us),
                               atol=0, rtol=0)
    # No backtracks row may carry the old -1 placeholder.
    assert (np.asarray(trace.backtracks) >= 0).all()


def test_checkpoint_structure_mismatch_raises(tmp_path):
    """Restoring into a template with a different pytree structure or leaf
    shapes raises instead of silently mis-assigning leaves."""

    import pytest

    state = {"xs": jnp.ones((3, 2)), "iter": jnp.int32(4)}
    path = os.path.join(tmp_path, "s.npz")
    save_solver_state(path, state)

    ok = load_solver_state(path, {"xs": jnp.zeros((3, 2)), "iter": jnp.int32(0)})
    np.testing.assert_array_equal(np.asarray(ok["xs"]), np.ones((3, 2)))

    with pytest.raises(ValueError):
        load_solver_state(path, {"xs": jnp.zeros((3, 2)),
                                 "iter": jnp.int32(0), "extra": jnp.zeros(1)})
    with pytest.raises(ValueError):
        load_solver_state(path, {"xs": jnp.zeros((5, 2)), "iter": jnp.int32(0)})


def test_checkpoint_roundtrip(tmp_path):
    problem = make_two_link_problem()
    T = 10
    x0 = jnp.asarray([0.2, 0.0, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, x0, us0)
    result = solve(problem, xs0, us0, config=ILQRConfig(max_iter=20))

    path = os.path.join(tmp_path, "ckpt.npz")
    save_solver_state(path, result)
    restored = load_solver_state(path, result)
    np.testing.assert_array_equal(np.asarray(restored.us), np.asarray(result.us))
    np.testing.assert_array_equal(np.asarray(restored.status),
                                  np.asarray(result.status))


def test_cost_library_forms():
    Q = jnp.asarray([1.0, 2.0, 0.0, 0.0])
    R = jnp.asarray([0.5, 0.5])
    target = jnp.asarray([1.0, -1.0, 0.0, 0.0])
    cost = quadratic_tracking_cost(Q, R, target)
    x = jnp.asarray([0.0, 0.0, 3.0, 3.0])
    u = jnp.asarray([2.0, -2.0])
    # (1*1 + 2*1) + (0.5*4 + 0.5*4) = 3 + 4
    np.testing.assert_allclose(float(cost(x, u)), 7.0)

    phi = quadratic_final_cost(Q, target, weight=10.0)
    np.testing.assert_allclose(float(phi(x)), 30.0)

    eff = effort_cost(2.0)
    np.testing.assert_allclose(float(eff(x, u)), 16.0)

    combo = add_costs(cost, eff)
    np.testing.assert_allclose(float(combo(x, u)), 23.0)


def test_workspace_cost_solves_two_link_with_adaptive_reg():
    """Solve the swing-up with a workspace (tool-point) cost instead of the
    joint-space IK cost — the reference's dead cost_functions.jl intent.

    The workspace cost is nonconvex (indefinite Qxx), so the fixed-λ
    backward pass produces a non-PD Quu and NaN gains on iteration 1 (the
    reference's LU-based solve would produce a garbage step and its
    unbounded line search would hang).  The adaptive λ-escalation schedule
    recovers and converges — this is the failure-recovery subsystem test."""

    params = TwoLinkParams()
    problem_joint = make_two_link_problem(params)
    target = jnp.asarray([params.target_x, params.target_y])

    def tool_fk(x):
        _, tool = forward_kinematics(params, x[:2])
        return tool

    def running_ws(x, u):
        return jnp.sum((tool_fk(x) - target) ** 2)

    from ilqr_tpu.costs import add_costs

    final = workspace_target_final_cost(tool_fk, target, weight=200.0)
    problem = Problem(
        dynamics=problem_joint.dynamics,
        cost=add_costs(effort_cost(0.01), running_ws),
        final_cost=final,
    )
    T = 300
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, x0, us0)

    # Without adaptive reg: fixed-λ backward pass fails on iteration 1.
    fixed = solve(problem, xs0, us0,
                  config=ILQRConfig(max_iter=50, tol=1e-8))
    assert int(fixed.status) == int(Status.LINESEARCH_FAILED)

    # With adaptive reg: converges to the target.
    result = solve(problem, xs0, us0,
                   config=ILQRConfig(max_iter=500, tol=1e-8, tol_grad=1e-10,
                                     adaptive_reg=True))
    assert int(result.status) == int(Status.CONVERGED)
    tool_err = float(jnp.sum((tool_fk(result.xs[-1]) - target) ** 2))
    assert tool_err < 1e-4, tool_err


def test_checkpoint_v2_named_paths_and_v1_legacy(tmp_path):
    """v2 checkpoints key leaves by pytree PATH (robust across JAX
    versions); v1 positional checkpoints still load; path mismatches name
    the offending leaf."""

    import pytest

    state = {"xs": jnp.ones((3, 2)), "nested": {"iter": jnp.int32(4)}}
    path = os.path.join(tmp_path, "v2.npz")
    save_solver_state(path, state)

    data = np.load(path)
    assert int(data["__format__"]) == 2
    assert any(k.startswith("path:") and "xs" in k for k in data.files)

    # Same structure, different leaf VALUES in template: loads saved values.
    ok = load_solver_state(path, {"xs": jnp.zeros((3, 2)),
                                  "nested": {"iter": jnp.int32(0)}})
    np.testing.assert_array_equal(np.asarray(ok["xs"]), np.ones((3, 2)))
    assert int(ok["nested"]["iter"]) == 4

    # A renamed key is a named error, not a silent positional mis-assign.
    with pytest.raises(ValueError, match="renamed"):
        load_solver_state(path, {"renamed": jnp.zeros((3, 2)),
                                 "nested": {"iter": jnp.int32(0)}})

    # Legacy v1 file (positional leaf_<i>) still loads.
    import jax as _jax

    leaves, _ = _jax.tree.flatten(state)
    v1 = os.path.join(tmp_path, "v1.npz")
    np.savez(v1, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    ok1 = load_solver_state(v1, state)
    np.testing.assert_array_equal(np.asarray(ok1["xs"]), np.ones((3, 2)))
