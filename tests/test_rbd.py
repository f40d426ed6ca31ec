"""Rigid-body layer tests.

The decisive check: a fixed-base planar 2-link URDF built with the analytic
model's parameters must reproduce the analytic inertia matrix exactly, and
the RNEA bias must match the Lagrangian bias  Ṁ θ̇ - 1/2 ∇_θ(θ̇ᵀ M θ̇)
derived from the analytic M — two completely independent derivations.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.models.rbd.dynamics import (
    crba_mass_matrix,
    rnea_bias,
    rnea_inverse_dynamics,
)
from ilqr_tpu.models.rbd.model import (
    TWO_DOF_ARM_URDF,
    make_rbd_arm_problem,
    make_rbd_dynamics,
    mrp_to_rbd_state,
    rbd_to_mrp_state,
)
from ilqr_tpu.models.rbd.rotations import (
    p_from_q,
    pdot_from_w,
    q_from_p,
    quat_multiply,
    quat_to_rotmat,
)
from ilqr_tpu.models.rbd.urdf import parse_urdf
from ilqr_tpu.models.two_link import TwoLinkParams, inertia_matrix

L = math.sqrt(2.0) / 2.0
PLANAR_2LINK_URDF = f"""
<robot name="planar2">
  <link name="base"/>
  <joint name="j1" type="revolute">
    <axis xyz="0 0 1"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="base"/><child link="l1"/>
  </joint>
  <link name="l1">
    <inertial>
      <mass value="1.0"/>
      <origin xyz="{L/2} 0 0"/>
      <inertia ixx="1e-9" iyy="{1.0*L*L/12.0}" izz="{1.0*L*L/12.0}"
               ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="j2" type="revolute">
    <axis xyz="0 0 1"/>
    <origin xyz="{L} 0 0" rpy="0 0 0"/>
    <parent link="l1"/><child link="l2"/>
  </joint>
  <link name="l2">
    <inertial>
      <mass value="1.0"/>
      <origin xyz="{L/2} 0 0"/>
      <inertia ixx="1e-9" iyy="{1.0*L*L/12.0}" izz="{1.0*L*L/12.0}"
               ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def planar_mech():
    return parse_urdf(PLANAR_2LINK_URDF, floating=False, gravity=(0.0, 0.0, 0.0))


def test_crba_matches_analytic_inertia(planar_mech):
    params = TwoLinkParams()
    rng = np.random.default_rng(0)
    for _ in range(5):
        theta = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
        M_rbd = crba_mass_matrix(planar_mech, theta)
        M_analytic = inertia_matrix(params, theta)
        np.testing.assert_allclose(np.asarray(M_rbd), np.asarray(M_analytic),
                                   rtol=1e-9, atol=1e-10)


def test_rnea_bias_matches_lagrangian(planar_mech):
    """bias = Ṁ θ̇ - 1/2 ∂/∂θ (θ̇ᵀ M θ̇), from the analytic M via autodiff."""

    params = TwoLinkParams()
    rng = np.random.default_rng(1)
    for _ in range(5):
        theta = jnp.asarray(rng.uniform(-np.pi, np.pi, 2))
        theta_dot = jnp.asarray(rng.standard_normal(2))

        bias_rbd = rnea_bias(planar_mech, theta,
                             theta_dot)

        dM = jax.jacfwd(lambda th: inertia_matrix(params, th))(theta)
        M_dot = jnp.einsum("ijk,k->ij", dM, theta_dot)
        kinetic_grad = 0.5 * jnp.einsum("ijk,i,j->k", dM, theta_dot, theta_dot)
        bias_lag = M_dot @ theta_dot - kinetic_grad

        np.testing.assert_allclose(np.asarray(bias_rbd), np.asarray(bias_lag),
                                   rtol=1e-8, atol=1e-9)


def test_gravity_bias(planar_mech):
    """With gravity on and zero velocity, bias = -(generalized gravity)."""

    from ilqr_tpu.models.rbd.urdf import Mechanism
    import dataclasses

    mech_g = dataclasses.replace(planar_mech, gravity=(0.0, -9.81, 0.0))
    theta = jnp.asarray([0.3, -0.7])
    bias = rnea_bias(mech_g, theta, jnp.zeros(2))

    # Potential energy U = g * sum_i m_i * y_com_i; bias(q, 0) = dU/dq.
    def potential(th):
        g = 9.81
        y1 = (L / 2) * jnp.sin(th[0])
        y2 = L * jnp.sin(th[0]) + (L / 2) * jnp.sin(th[0] + th[1])
        return g * (y1 + y2)

    grad_U = jax.grad(potential)(theta)
    np.testing.assert_allclose(np.asarray(bias), np.asarray(grad_U),
                               rtol=1e-8, atol=1e-10)


def test_urdf_parse_reference_arm():
    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True, gravity=(0.0, 0.0, 0.0))
    assert mech.n_bodies == 3
    assert mech.joints[0].joint_type == "floating"
    assert mech.nq == 9 and mech.nv == 8  # 4+3 quat-pos + 2 revolute
    assert mech.joints[1].joint_type == "revolute"
    assert mech.links[0].mass == 30.0
    assert mech.joints[2].effort_limit == 1000.0


def test_six_dof_arm_parses_and_simulates():
    """The reference ships an (unused) 6-DoF arm URDF; it must parse and
    produce a sane fixed-base dynamics model."""

    import os

    from ilqr_tpu.models.rbd.model import ASSET_DIR
    from ilqr_tpu.problem import rollout

    path = os.path.join(ASSET_DIR, "6Dof_arm.urdf")
    mech = parse_urdf(path, floating=False, gravity=(0.0, 0.0, 0.0))
    assert mech.nv == 6
    theta = jnp.asarray(np.linspace(-0.4, 0.4, 6))
    M = crba_mass_matrix(mech, theta)
    # SPD mass matrix.
    eigs = np.linalg.eigvalsh(np.asarray(M))
    assert (eigs > 0).all(), eigs
    # Zero-velocity, zero-gravity bias vanishes.
    bias = rnea_bias(mech, theta, jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(bias), 0.0, atol=1e-12)

    # RK4 rollout of the passive arm stays finite and conserves energy.
    import dataclasses as _dc

    dt = 0.002

    def cont(x, u):
        from ilqr_tpu.models.rbd.dynamics import forward_dynamics

        q, v = x[:6], x[6:]
        vdot = forward_dynamics(mech, q, v, u)
        return jnp.concatenate([v, vdot])

    def dyn(x, u):
        k1 = dt * cont(x, u)
        k2 = dt * cont(x + k1 / 2, u)
        k3 = dt * cont(x + k2 / 2, u)
        k4 = dt * cont(x + k3, u)
        return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0

    x0 = jnp.concatenate([theta, 0.2 * jnp.ones(6)])
    xs = rollout(dyn, x0, jnp.zeros((25, 6)))
    assert np.isfinite(np.asarray(xs)).all()

    def kinetic(x):
        return 0.5 * x[6:] @ crba_mass_matrix(mech, x[:6]) @ x[6:]

    e0, e1 = float(kinetic(xs[0])), float(kinetic(xs[-1]))
    assert abs(e1 - e0) / abs(e0) < 1e-6


def test_mrp_quaternion_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.standard_normal(4)
    q = jnp.asarray(q / np.linalg.norm(q))
    q = jnp.where(q[0] < 0, -q, q)  # hemisphere with w > 0
    p = p_from_q(q)
    q2 = q_from_p(p)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-12)


def test_mrp_kinematics_consistent_with_quaternion():
    """d/dt p(q(t)) with q̇ = 1/2 q ⊗ [0, ω] equals pdot_from_w(p, ω)."""

    rng = np.random.default_rng(3)
    q = rng.standard_normal(4); q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    q = jnp.asarray(q)
    w = jnp.asarray(rng.standard_normal(3))

    qdot = 0.5 * quat_multiply(q, jnp.concatenate([jnp.zeros(1), w]))
    # Chain rule through p(q).
    pdot_chain = jax.jacfwd(p_from_q)(q) @ qdot
    pdot_direct = pdot_from_w(p_from_q(q), w)
    np.testing.assert_allclose(np.asarray(pdot_chain), np.asarray(pdot_direct),
                               atol=1e-10)


def test_floating_base_free_body_conservation():
    """Zero torque, zero gravity: a floating mechanism's momentum-linked
    quantities stay finite and kinetic energy is conserved by RK4 to high
    order over a short run."""

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True, gravity=(0.0, 0.0, 0.0))
    dyn = make_rbd_dynamics(mech, dt=0.01)
    x = jnp.concatenate([
        jnp.zeros(3),                     # MRP
        jnp.asarray([0.5, 0.75, 1.0]),    # base position
        jnp.zeros(2),                     # joints
        jnp.asarray([0.1, -0.2, 0.05]),   # ω
        jnp.asarray([0.3, 0.0, -0.1]),    # v
        jnp.asarray([0.4, -0.3]),         # θ̇
    ])

    def kinetic(x):
        q = jnp.concatenate([q_from_p(x[:3]), x[3:6], x[6:8]])
        v = x[8:]
        M = crba_mass_matrix(mech, q)
        return 0.5 * v @ M @ v

    e0 = float(kinetic(x))
    u = jnp.zeros(8)
    for _ in range(50):
        x = dyn(x, u)
    e1 = float(kinetic(x))
    assert np.isfinite(np.asarray(x)).all()
    assert abs(e1 - e0) / abs(e0) < 1e-6, (e0, e1)


def test_rbd_state_roundtrip():
    rng = np.random.default_rng(4)
    q = rng.standard_normal(4); q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    x_rbd = jnp.asarray(np.concatenate([q, rng.standard_normal(13)]))
    x_mrp = rbd_to_mrp_state(x_rbd)
    back = mrp_to_rbd_state(x_mrp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x_rbd), atol=1e-12)


def test_rbd_problem_solves():
    """config 2 in miniature: iLQR through the full rigid-body autodiff
    stack decreases cost and stays finite."""

    from ilqr_tpu.config import ILQRConfig
    from ilqr_tpu.problem import rollout, total_cost
    from ilqr_tpu.solver import solve

    problem = make_rbd_arm_problem()
    T = 20
    # Start at the example's initial configuration
    # (animate_RBD_2_link.jl:9: q = [0,0,0,1, .5,.75,1, 0,0] — note the
    # identity quaternion is scalar-LAST there; ours is scalar-first).
    x0 = jnp.concatenate([
        jnp.zeros(3), jnp.asarray([0.5, 0.75, 1.0]), jnp.zeros(2),
        jnp.zeros(8),
    ])
    us0 = jnp.zeros((T, 8))
    xs0 = rollout(problem.dynamics, x0, us0)
    cost0 = float(total_cost(problem, xs0, us0))

    result = solve(problem, xs0, us0, config=ILQRConfig(max_iter=15, tol=0.0))
    assert np.isfinite(np.asarray(result.us)).all()
    assert float(result.cost) < cost0


# ---------------------------------------------------------------------------
# World-frame forward kinematics (kinematics.py).
# ---------------------------------------------------------------------------

def test_fk_matches_analytic_two_link(planar_mech):
    """body_point_in_world on the planar 2-link tree equals the analytic
    model's forward kinematics for the elbow and tool point."""

    from ilqr_tpu.models.rbd.kinematics import body_point_in_world
    from ilqr_tpu.models.two_link import forward_kinematics as fk_analytic

    params = TwoLinkParams()
    theta = jnp.asarray([0.37, -1.12])
    j1, tool = fk_analytic(params, theta)

    elbow = body_point_in_world(planar_mech, theta, "l1", [L, 0.0, 0.0])
    tip = body_point_in_world(planar_mech, theta, "l2", [L, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(elbow[:2]), np.asarray(j1),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(tip[:2]), np.asarray(tool),
                               atol=1e-12)
    assert float(tip[2]) == 0.0  # planar


def test_fk_floating_base_translation_and_rotation():
    """Floating base: FK places children at base pose + rotated offsets."""

    from ilqr_tpu.models.rbd.kinematics import forward_kinematics
    from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF
    from ilqr_tpu.models.rbd.rotations import quat_to_rotmat

    mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))
    # 90° about z, base at (1, 2, 3).
    q_base = jnp.asarray([math.cos(math.pi / 4), 0.0, 0.0,
                          math.sin(math.pi / 4)])
    r_base = jnp.asarray([1.0, 2.0, 3.0])
    q = jnp.concatenate([q_base, r_base, jnp.zeros(mech.nq - 7)])
    poses = forward_kinematics(mech, q)
    R0, p0 = poses[0]
    np.testing.assert_allclose(np.asarray(p0), [1.0, 2.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(R0),
                               np.asarray(quat_to_rotmat(q_base)), atol=1e-12)
    # Every child's world position = base + R0 @ (its position with the
    # identity base at the origin).
    q_id = jnp.concatenate([jnp.asarray([1.0, 0.0, 0.0, 0.0]),
                            jnp.zeros(3), q[7:]])
    poses_id = forward_kinematics(mech, q_id)
    for (R, p), (Ri, pi) in zip(poses[1:], poses_id[1:]):
        np.testing.assert_allclose(np.asarray(p),
                                   np.asarray(r_base + R0 @ pi), atol=1e-10)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R0 @ Ri),
                                   atol=1e-10)


def test_workspace_cost_via_fk_is_differentiable(planar_mech):
    """The reference's dead cost_functions.jl pattern, alive: a workspace
    final cost built on FK has correct gradients (vs finite differences)
    and vmaps."""

    from ilqr_tpu.costs import workspace_target_final_cost
    from ilqr_tpu.models.rbd.kinematics import body_point_in_world

    def tool_xy(x):
        return body_point_in_world(planar_mech, x[:2], "l2", [L, 0.0, 0.0])[:2]

    phi = workspace_target_final_cost(tool_xy, target=[0.6, -0.5],
                                      weight=3.0)
    x = jnp.asarray([0.3, 0.4, 0.0, 0.0])
    g = jax.grad(phi)(x)
    eps = 1e-6
    for i in range(2):
        xp = x.at[i].add(eps)
        xm = x.at[i].add(-eps)
        fd = (phi(xp) - phi(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g[2:]), 0.0, atol=1e-12)

    batch = jnp.stack([x, x + 0.1, x - 0.2])
    vals = jax.vmap(phi)(batch)
    assert vals.shape == (3,) and bool(jnp.all(jnp.isfinite(vals)))


def test_scalar_algorithms_match_matrix():
    """The scalar-expression CRBA/RNEA (scalar_ops DAG, the production hot
    path) equal the matrix-form algorithms to rounding at arbitrary raw
    coordinates, with and without gravity."""

    from ilqr_tpu.models.rbd.dynamics import (
        crba_mass_matrix_scalar,
        rnea_bias_scalar,
        rnea_inverse_dynamics_scalar,
    )

    for gravity in [(0.0, 0.0, 0.0), (0.0, 0.0, -9.81)]:
        mech = parse_urdf(TWO_DOF_ARM_URDF, floating=True, gravity=gravity)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            key, k1, k2, k3 = jax.random.split(key, 4)
            q = 0.4 * jax.random.normal(k1, (mech.nq,))
            v = 0.4 * jax.random.normal(k2, (mech.nv,))
            a = 0.4 * jax.random.normal(k3, (mech.nv,))
            np.testing.assert_allclose(
                np.asarray(crba_mass_matrix_scalar(mech, q)),
                np.asarray(crba_mass_matrix(mech, q)),
                rtol=1e-12, atol=1e-13)
            np.testing.assert_allclose(
                np.asarray(rnea_bias_scalar(mech, q, v)),
                np.asarray(rnea_bias(mech, q, v)),
                rtol=1e-12, atol=1e-13)
            np.testing.assert_allclose(
                np.asarray(rnea_inverse_dynamics_scalar(mech, q, v, a)),
                np.asarray(rnea_inverse_dynamics(mech, q, v, a)),
                rtol=1e-12, atol=1e-13)
