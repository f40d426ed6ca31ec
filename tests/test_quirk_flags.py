"""Tests for the reference-quirk replication flags.

Two reference quirks are replicated behind flags (default = reference
behavior); these tests exercise BOTH branches of each so neither is dead
code:

* ``TwoLinkParams.faithful_coriolis`` — the reference's Coriolis loop reads
  ``for k in length(θ)`` (2_link_helper_functions.jl:42-44), iterating only
  k = 2 instead of the full Christoffel sum.
* ``reference_kinematics`` on the RBD model — the reference integrates base
  position as ``ṙ = v`` with a *body-frame* linear velocity
  (RBD_helper_functions.jl:68); the correct chart is ``ṙ = R(q) v``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.two_link import (
    TwoLinkParams,
    coriolis_matrix,
    continuous_dynamics,
    inertia_matrix,
    make_two_link_problem,
)


def test_two_link_coriolis_quirk_is_benign_for_this_model():
    """For the planar 2-link arm only θ₂ enters M, and the skipped k=1
    Christoffel terms cancel by symmetry of M — the reference's k-loop
    quirk happens to produce the correct Coriolis matrix for its own test
    model.  Pin that fact: both branches must agree exactly here (the quirk
    WOULD matter for a model whose M depends on more than the last joint)."""

    rng = np.random.default_rng(0)
    faithful = TwoLinkParams(faithful_coriolis=True)
    full = TwoLinkParams(faithful_coriolis=False)
    for _ in range(5):
        theta = jnp.asarray(rng.standard_normal(2))
        theta_dot = jnp.asarray(rng.standard_normal(2))
        C_quirk = coriolis_matrix(faithful, theta, theta_dot)
        C_full = coriolis_matrix(full, theta, theta_dot)
        np.testing.assert_allclose(np.asarray(C_quirk), np.asarray(C_full),
                                   atol=1e-14)


def test_full_coriolis_satisfies_power_balance():
    """The quirk-free branch must satisfy the manipulator identity
    Ṁ = C + Cᵀ (equivalently θ̇ᵀ(Ṁ − 2C)θ̇ = 0, passivity): with u = 0 and
    no gravity, kinetic energy ½θ̇ᵀM(θ)θ̇ is conserved along exact dynamics."""

    params = TwoLinkParams(faithful_coriolis=False)
    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.standard_normal(2))
    theta_dot = jnp.asarray(rng.standard_normal(2))

    # dE/dt along the flow = θ̇ᵀ(½Ṁ − C)θ̇ must vanish.
    dM = jax.jacfwd(lambda th: inertia_matrix(params, th))(theta)
    M_dot = jnp.einsum("ijk,k->ij", dM, theta_dot)
    C = coriolis_matrix(params, theta, theta_dot)
    power = float(theta_dot @ (0.5 * M_dot - C) @ theta_dot)
    assert abs(power) < 1e-12, power

    # And numerically: free RK4 motion conserves energy to O(dt^4).
    x = jnp.concatenate([theta, theta_dot])
    u0 = jnp.zeros(2)

    def energy(x):
        th, thd = x[:2], x[2:]
        return 0.5 * thd @ inertia_matrix(params, th) @ thd

    dt = 1e-3

    def rk4(x):
        k1 = dt * continuous_dynamics(params, x, u0)
        k2 = dt * continuous_dynamics(params, x + k1 / 2, u0)
        k3 = dt * continuous_dynamics(params, x + k2 / 2, u0)
        k4 = dt * continuous_dynamics(params, x + k3, u0)
        return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0

    e0 = float(energy(x))
    for _ in range(100):
        x = rk4(x)
    assert abs(float(energy(x)) - e0) < 1e-10 * max(1.0, abs(e0))


def test_two_link_problem_solves_with_full_coriolis():
    """End-to-end: the quirk-free model is a valid Problem that converges."""

    from ilqr_tpu.config import ILQRConfig, Status
    from ilqr_tpu.problem import rollout
    from ilqr_tpu.solver import solve

    problem = make_two_link_problem(TwoLinkParams(faithful_coriolis=False))
    T = 60
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, x0, us0)
    result = solve(problem, xs0, us0,
                   config=ILQRConfig(max_iter=2000, tol=1e-6))
    assert int(result.status) == int(Status.CONVERGED)


def _rbd_dynamics_pair():
    from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF, make_rbd_dynamics
    from ilqr_tpu.models.rbd.urdf import parse_urdf

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    ref = make_rbd_dynamics(mech, dt=0.01, reference_kinematics=True)
    true = make_rbd_dynamics(mech, dt=0.01, reference_kinematics=False)
    return mech, ref, true


def test_reference_kinematics_agrees_at_identity_attitude():
    """With p = 0 (identity attitude) R(q) = I, so ṙ = v and ṙ = R v agree;
    both dynamics must produce the same step from an identity-attitude,
    zero-angular-velocity state."""

    _, dyn_ref, dyn_true = _rbd_dynamics_pair()
    rng = np.random.default_rng(2)
    x = jnp.zeros(16)
    # identity attitude (p=0), zero angular velocity — attitude stays
    # identity through the whole RK4 substep chain only if ω stays 0, so
    # use zero base wrench.
    x = x.at[3:6].set(jnp.asarray(rng.standard_normal(3)))       # position
    x = x.at[6:8].set(jnp.asarray(rng.standard_normal(2)))       # joints
    x = x.at[11:14].set(jnp.asarray(0.1 * rng.standard_normal(3)))  # v
    x = x.at[14:16].set(jnp.asarray(0.1 * rng.standard_normal(2)))  # θ̇
    u = jnp.zeros(8).at[6:].set(jnp.asarray(0.1 * rng.standard_normal(2)))

    np.testing.assert_allclose(np.asarray(dyn_ref(x, u)),
                               np.asarray(dyn_true(x, u)), atol=1e-12)


def test_reference_kinematics_differs_only_in_base_position_rows():
    """At a non-identity attitude the two charts differ in the base-position
    derivative by (R − I)v and nowhere else (single continuous-dynamics
    evaluation via a tiny dt Euler check)."""

    from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF, make_rbd_dynamics
    from ilqr_tpu.models.rbd.rotations import q_from_p, quat_to_rotmat
    from ilqr_tpu.models.rbd.urdf import parse_urdf

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    # Tiny dt so RK4 ~ one continuous evaluation (differences in higher
    # RK4 stages are O(dt^2) and negligible at the tolerance used).
    dt = 1e-9
    dyn_ref = make_rbd_dynamics(mech, dt=dt, reference_kinematics=True)
    dyn_true = make_rbd_dynamics(mech, dt=dt, reference_kinematics=False)

    rng = np.random.default_rng(3)
    x = jnp.asarray(0.3 * rng.standard_normal(16))
    u = jnp.asarray(0.1 * rng.standard_normal(8))

    step_ref = (dyn_ref(x, u) - x) / dt     # ≈ ẋ under ṙ = v
    step_true = (dyn_true(x, u) - x) / dt   # ≈ ẋ under ṙ = R v

    diff = np.asarray(step_ref - step_true)
    # Rows 3:6 (base position) differ by (I - R) v.
    R = quat_to_rotmat(q_from_p(x[:3]))
    v = x[11:14]
    expected = np.asarray(v - R @ v)
    np.testing.assert_allclose(diff[3:6], expected, rtol=1e-4, atol=1e-7)
    # Every other row is identical.
    np.testing.assert_allclose(diff[:3], 0.0, atol=1e-7)
    np.testing.assert_allclose(diff[6:], 0.0, atol=1e-7)


def test_rbd_problem_solves_with_reference_kinematics():
    """End-to-end: the ṙ = v quirk path is a valid Problem whose cost
    decreases under the solver (short-horizon smoke, like test_rbd's)."""

    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
    from ilqr_tpu.problem import rollout, total_cost
    from ilqr_tpu.solver import solve

    problem = make_rbd_arm_problem(reference_kinematics=True)
    T = 20
    x0 = jnp.zeros(16)
    us0 = jnp.zeros((T, 8))
    xs0 = rollout(problem.dynamics, x0, us0)
    cost0 = float(total_cost(problem, xs0, us0))
    result = solve(problem, xs0, us0, config=ILQRConfig(max_iter=15, tol=1e-10))
    assert float(result.cost) < cost0
    assert np.all(np.isfinite(np.asarray(result.us)))
