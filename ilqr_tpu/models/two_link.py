"""Analytic planar 2-link manipulator — the framework's golden model.

Re-derivation of the reference's canonical test problem
(test/2_link_example/2_link_helper_functions.jl) in pure JAX: closed-form
inertia matrix, Coriolis matrix via ``jacfwd`` of the inertia matrix, RK4
integration, and joint-space quadratic costs targeting the inverse
kinematics of a workspace tool location.  Everything is jit/vmap/jacfwd
safe, so the whole model batches over scenarios for free.

Parity notes (these matter for the ``|u - u_ref|_inf < 1e-3`` target):

* The reference's Coriolis loop reads ``for k in length(θ)``
  (2_link_helper_functions.jl:42-44).  In Julia, iterating the *integer*
  ``length(θ)`` yields the single value ``2`` — so only the last joint's
  velocity contributes, not the full Christoffel sum.  We replicate that
  behavior by default (``faithful_coriolis=True``) and provide the correct
  full sum as an option.
* The reference computes a ``velocity_penalty`` in ``immediate_cost`` and
  then does not add it to the returned cost
  (2_link_helper_functions.jl:94-99) — the cost is joint-error + torque
  only.  We match.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ilqr_tpu.problem import Problem


@dataclasses.dataclass(frozen=True)
class TwoLinkParams:
    """Link parameters (values from 2_link_helper_functions.jl:4-16)."""

    l1: float = math.sqrt(2.0) / 2.0
    l2: float = math.sqrt(2.0) / 2.0
    m1: float = 1.0
    m2: float = 1.0
    dt: float = 0.01
    target_x: float = 0.6
    target_y: float = -0.5
    faithful_coriolis: bool = True  # replicate the reference's k-loop quirk

    @property
    def r1(self):
        return 0.5 * self.l1

    @property
    def r2(self):
        return 0.5 * self.l2

    @property
    def Iz1(self):
        return self.m1 * self.l1 ** 2 / 12.0

    @property
    def Iz2(self):
        return self.m2 * self.l2 ** 2 / 12.0

    # Standard 2-link inertia constants (2_link_helper_functions.jl:11-13).
    @property
    def alpha(self):
        return self.Iz1 + self.Iz2 + self.m1 * self.r1 ** 2 + self.m2 * (
            self.l1 ** 2 + self.r2 ** 2)

    @property
    def beta(self):
        return self.m2 * self.l1 * self.r2

    @property
    def delta(self):
        return self.Iz2 + self.m2 * self.r2 ** 2


def inverse_kinematics(params: TwoLinkParams, target):
    """Elbow-up IK for a workspace point (2_link_helper_functions.jl:19-26)."""

    x, y = target[0], target[1]
    l1, l2 = params.l1, params.l2
    c2 = (x ** 2 + y ** 2 - l1 ** 2 - l2 ** 2) / (2.0 * l1 * l2)
    q2 = jnp.arccos(c2)
    q1 = jnp.arctan2(y, x) - jnp.arctan2(l2 * jnp.sin(q2), l1 + l2 * jnp.cos(q2))
    return jnp.stack([q1, q2])


def forward_kinematics(params: TwoLinkParams, theta):
    """Joint and tool positions, for visualization and workspace costs."""

    j1 = jnp.stack([params.l1 * jnp.cos(theta[0]), params.l1 * jnp.sin(theta[0])])
    tool = j1 + jnp.stack([
        params.l2 * jnp.cos(theta[0] + theta[1]),
        params.l2 * jnp.sin(theta[0] + theta[1]),
    ])
    return j1, tool


def inertia_matrix(params: TwoLinkParams, theta):
    """M(theta) [2, 2] (2_link_helper_functions.jl:29-33)."""

    a, b, d = params.alpha, params.beta, params.delta
    c2 = jnp.cos(theta[1])
    d_ = jnp.full_like(c2, d)
    return jnp.stack([
        jnp.stack([a + 2.0 * b * c2, d + b * c2]),
        jnp.stack([d + b * c2, d_]),
    ])


def inertia_matrix_grad(params: TwoLinkParams, theta):
    """Closed-form ``dM[a, b, c] = dM[a,b]/dtheta[c]`` [2, 2, 2].

    Only ``theta[1]`` enters M (through ``cos``), so the gradient has one
    nonzero slice.  Using the closed form instead of
    ``jacfwd(inertia_matrix)`` matters for performance: the Coriolis matrix
    sits inside the dynamics, so ``linearize_dynamics`` would otherwise
    push second-order forward duals through the nested jacobian — with the
    closed form the dynamics is plain first-order trig under AD.  Verified
    against ``jacfwd`` in tests/test_derivatives.py.
    """

    b = params.beta
    s2 = jnp.sin(theta[1])
    zero = jnp.zeros_like(s2)
    # [a, b] entries of dM/dtheta2.
    d2 = jnp.stack([
        jnp.stack([-2.0 * b * s2, -b * s2]),
        jnp.stack([-b * s2, zero]),
    ])
    return jnp.stack([jnp.zeros_like(d2), d2], axis=-1)


def coriolis_matrix(params: TwoLinkParams, theta, theta_dot):
    """C(theta, theta_dot) [2, 2].

    ``dM[a, b, c] = dM[a,b]/dtheta[c]`` (closed form) — the same layout the
    reference gets from reshaping ForwardDiff's jacobian column-major
    (2_link_helper_functions.jl:37-38).  With ``faithful_coriolis`` only
    ``k = n-1`` contributes (see module docstring); otherwise the full
    Christoffel-style sum over k is used.
    """

    dM = inertia_matrix_grad(params, theta)  # [2,2,2]
    n = theta.shape[0]
    ks = [n - 1] if params.faithful_coriolis else list(range(n))
    rows = []
    for i in range(n):
        row = []
        for j in range(n):
            cij = 0.0
            for k in ks:
                cij = cij + 0.5 * (dM[k, i, j] + dM[j, i, k] - dM[i, k, j]) * theta_dot[k]
            row.append(cij)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def continuous_dynamics(params: TwoLinkParams, state, u):
    """xdot = [theta_dot; M^{-1}(-C theta_dot + u)]
    (2_link_helper_functions.jl:53-69), fully scalar-expanded for n=2.

    Why scalar instead of ``solve_psd_small(M, -C @ theta_dot + u)``: under
    ``vmap`` + ``jacfwd`` every tiny ``[2,2] @ [2]`` becomes a batched
    dot_general with contraction size 2, which TPU lowers onto 128-wide MXU
    passes at ~1% utilization (forced to full-f32 passes by the solver's
    precision pin).  Hand-expanding the 2x2 algebra — explicit
    determinant inverse, componentwise Coriolis — keeps the whole dynamics
    (and its forward-mode duals) as pure [batch]-wide VPU elementwise ops.
    Measured at the headline config (B=4096, T=100): the linearization +
    Riccati step drops 27.8 -> 6.5 ms (BENCH.md round 3).  Identical math;
    equality with the matrix form is asserted in tests/test_derivatives.py.
    """

    t2 = state[1]
    td = (state[2], state[3])
    c2 = jnp.cos(t2)
    s2 = jnp.sin(t2)
    al, be, de = params.alpha, params.beta, params.delta
    m11 = al + 2.0 * be * c2
    m12 = de + be * c2
    m22 = de

    # dM[a][b][c] = dM[a,b]/dtheta[c] as trace-time scalar expressions
    # (inertia_matrix_grad's closed form; only theta2 enters M).
    g = -be * s2
    zero = jnp.zeros_like(s2)
    dM = ((
        (zero, 2.0 * g), (zero, g)), (
        (zero, g), (zero, zero)))

    ks = (1,) if params.faithful_coriolis else (0, 1)

    def C(i, j):
        cij = 0.0
        for k in ks:
            cij = cij + 0.5 * (dM[k][i][j] + dM[j][i][k] - dM[i][k][j]) * td[k]
        return cij

    g1 = -(C(0, 0) * td[0] + C(0, 1) * td[1]) + u[0]
    g2 = -(C(1, 0) * td[0] + C(1, 1) * td[1]) + u[1]
    det = m11 * m22 - m12 * m12
    qdd1 = (m22 * g1 - m12 * g2) / det
    qdd2 = (m11 * g2 - m12 * g1) / det
    return jnp.stack([td[0], td[1], qdd1, qdd2])


def make_dynamics(params: TwoLinkParams):
    """RK4 discrete dynamics (2_link_helper_functions.jl:72-78)."""

    dt = params.dt

    def dynamics(x, u):
        k1 = dt * continuous_dynamics(params, x, u)
        k2 = dt * continuous_dynamics(params, x + k1 / 2.0, u)
        k3 = dt * continuous_dynamics(params, x + k2 / 2.0, u)
        k4 = dt * continuous_dynamics(params, x + k3, u)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    return dynamics


def make_two_link_problem(params: TwoLinkParams = TwoLinkParams(),
                          analytic_cost_derivatives: bool = True) -> Problem:
    """The reference's swing-up problem: drive joints to the IK of the tool
    target, penalizing torque (2_link_helper_functions.jl:82-108).

    The costs are exact quadratics, so by default the Problem carries
    analytic (constant-Hessian) quadratization hooks — the solver then
    skips the per-step cost AD entirely.  ``analytic_cost_derivatives=
    False`` falls back to autodiff quadratization (identical results,
    tested in tests/test_derivatives.py).
    """

    target = jnp.array([params.target_x, params.target_y])
    target_joints = inverse_kinematics(params, target)

    def immediate_cost(x, u):
        n = x.shape[0] // 2
        joint_err = target_joints - x[:n]
        # Reference computes a velocity penalty here and drops it (:94-99).
        return jnp.sum(joint_err ** 2) + jnp.sum(u ** 2)

    def final_cost(x):
        n = x.shape[0] // 2
        joint_err = target_joints - x[:n]
        return jnp.sum(joint_err ** 2)

    kw = {}
    if analytic_cost_derivatives:
        def cost_quadratization(x, u):
            n = x.shape[0] // 2
            dtype = x.dtype
            joint_err = target_joints.astype(dtype) - x[:n]
            q = jnp.sum(joint_err ** 2) + jnp.sum(u ** 2)
            qx = jnp.concatenate([-2.0 * joint_err, jnp.zeros_like(x[n:])])
            ru = 2.0 * u
            Qxx = jnp.diag(jnp.concatenate([
                jnp.full((n,), 2.0, dtype), jnp.zeros((n,), dtype)]))
            Pux = jnp.zeros((u.shape[0], x.shape[0]), dtype)
            Ruu = 2.0 * jnp.eye(u.shape[0], dtype=dtype)
            return q, qx, ru, Qxx, Pux, Ruu

        def final_cost_quadratization(x):
            n = x.shape[0] // 2
            dtype = x.dtype
            joint_err = target_joints.astype(dtype) - x[:n]
            q = jnp.sum(joint_err ** 2)
            qx = jnp.concatenate([-2.0 * joint_err, jnp.zeros_like(x[n:])])
            Qxx = jnp.diag(jnp.concatenate([
                jnp.full((n,), 2.0, dtype), jnp.zeros((n,), dtype)]))
            return q, qx, Qxx

        kw = dict(cost_quadratization=cost_quadratization,
                  final_cost_quadratization=final_cost_quadratization)

    return Problem(
        dynamics=make_dynamics(params),
        cost=immediate_cost,
        final_cost=final_cost,
        state_dim=4,
        control_dim=2,
        name="two_link",
        **kw,
    )
