"""Floating-base arm model on the rigid-body layer — the reference's second
benchmark problem (test/RBD_2_link_example/RBD_helper_functions.jl).

State chart (matching the reference's iLQR state, n = 2*nv):

    x = [p (3, MRP attitude), r (3, base position), θ (nj, joints),
         ω (3, body angular vel), v (3, body linear vel), θ̇ (nj)]

The reference integrates base position as ``ṙ = v`` even though the
floating joint's linear velocity is body-frame
(RBD_helper_functions.jl:68 — RigidBodyDynamics.jl would use ṙ = R(q) v);
``reference_kinematics=True`` replicates that, the default uses the correct
rotation.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ilqr_tpu.models.rbd.dynamics import forward_dynamics
from ilqr_tpu.models.rbd.rotations import (
    p_from_q,
    pdot_from_w,
    q_from_p,
    quat_to_rotmat,
)
from ilqr_tpu.models.rbd.urdf import Mechanism, parse_urdf
from ilqr_tpu.problem import Problem

ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")
TWO_DOF_ARM_URDF = os.path.join(ASSET_DIR, "2Dof_arm.urdf")


def rbd_to_mrp_state(x):
    """[quat(4); rest] → [mrp(3); rest] (RBD_helper_functions.jl:29-33)."""

    return jnp.concatenate([p_from_q(x[:4]), x[4:]])


def mrp_to_rbd_state(x):
    """[mrp(3); rest] → [quat(4); rest] (RBD_helper_functions.jl:36-41)."""

    return jnp.concatenate([q_from_p(x[:3]), x[3:]])


def make_rbd_continuous_dynamics(mech: Mechanism,
                                 reference_kinematics: bool = False,
                                 analytic_derivatives: bool = True):
    """The continuous dynamics ``ẋ = f_c(x, u)`` over the MRP state
    (RBD_helper_functions.jl:51-69): chart kinematics rows + forward
    dynamics ``v̇ = M(q)^{-1}(u - bias)``."""

    assert mech.joints[0].joint_type == "floating", (
        "make_rbd_continuous_dynamics expects a floating-base mechanism")
    nj = mech.nv - 6

    if analytic_derivatives:
        from ilqr_tpu.models.rbd.dynamics import (
            make_forward_dynamics_analytic_jvp,
        )

        fd = make_forward_dynamics_analytic_jvp(mech)
    else:
        def fd(q, v, tau):
            return forward_dynamics(mech, q, v, tau)

    def continuous_dynamics(x, u):
        p = x[0:3]
        r = x[3:6]
        theta = x[6:6 + nj]
        vel = x[6 + nj:]           # [ω(3), v(3), θ̇(nj)]
        omega = vel[0:3]
        v_lin = vel[3:6]

        quat = q_from_p(p)
        q_mech = jnp.concatenate([quat, r, theta])
        vdot = fd(q_mech, vel, u)

        p_dot = pdot_from_w(p, omega)
        if reference_kinematics:
            r_dot = v_lin          # the reference's ṙ = v quirk (:68)
        else:
            r_dot = quat_to_rotmat(quat) @ v_lin
        theta_dot = vel[6:]
        q_dot = jnp.concatenate([p_dot, r_dot, theta_dot])
        return jnp.concatenate([q_dot, vdot])

    return continuous_dynamics


def make_rbd_dynamics(mech: Mechanism, dt: float = 0.01,
                      reference_kinematics: bool = False,
                      analytic_derivatives: bool = True):
    """RK4 discrete dynamics over the MRP state
    (RBD_helper_functions.jl:48-79).

    The mechanism must have a floating base joint first (``parse_urdf(...,
    floating=True)``).  ``u`` spans all nv degrees of freedom — like the
    reference, the base is directly actuated (6 wrench components) alongside
    the joint torques.

    ``analytic_derivatives`` (default on) routes forward dynamics through
    the Carpentier-Mansard custom JVP
    (:func:`ilqr_tpu.models.rbd.dynamics.make_forward_dynamics_analytic_jvp`):
    identical values, and ``jacfwd`` of the dynamics differentiates only
    the RNEA recursion at fixed acceleration instead of CRBA + Cholesky —
    the iLQR linearization sweep is the dominant RBD cost, so this is the
    main RBD throughput lever.  Set False for the plain-AD path (used by
    the equivalence test).
    """

    continuous_dynamics = make_rbd_continuous_dynamics(
        mech, reference_kinematics=reference_kinematics,
        analytic_derivatives=analytic_derivatives)

    def dynamics(x, u):
        k1 = dt * continuous_dynamics(x, u)
        k2 = dt * continuous_dynamics(x + k1 / 2.0, u)
        k3 = dt * continuous_dynamics(x + k2 / 2.0, u)
        k4 = dt * continuous_dynamics(x + k3, u)
        return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0

    return dynamics


def make_rbd_stage_jacobians(mech: Mechanism,
                             reference_kinematics: bool = False):
    """``(f_c(x, u), ∂f_c/∂x [n, n], ∂f_c/∂u [n, m])`` of the continuous
    dynamics in ONE explicit sweep — no tangent replay at all.

    The velocity rows come from
    :func:`ilqr_tpu.models.rbd.dynamics.forward_dynamics_derivatives`
    (explicit Carpentier-Mansard ∂RNEA/∂q, ∂RNEA/∂v + one primal Cholesky
    shared by the forward-dynamics solve, both derivative solves, and
    ``∂v̇/∂u = M⁻¹``); the chart rows (MRP kinematics ``ṗ(p, ω)``, base
    position ``ṙ``, and the MRP→quaternion jacobian ``∂quat/∂p``) are
    closed-form jacfwd of 3-4 dimensional rational maps.  Replaces the
    r3/r4 path that replayed the forward-dynamics JVP over all n = 2nv
    one-hot state tangents (ROADMAP 3b / VERDICT r4 next #1).
    """

    import jax

    from ilqr_tpu.models.rbd.dynamics import forward_dynamics_derivatives

    nv = mech.nv
    nj = nv - 6
    n = 2 * nv

    def stage(x, u):
        p = x[0:3]
        r = x[3:6]
        theta = x[6:6 + nj]
        vel = x[6 + nj:]
        omega = vel[0:3]
        v_lin = vel[3:6]

        quat = q_from_p(p)
        Jqp = jax.jacfwd(q_from_p)(p)   # [4, 3] chart jacobian

        q_mech = jnp.concatenate([quat, r, theta])
        vdot, dvd_dq, dvd_dv, Minv = forward_dynamics_derivatives(
            mech, q_mech, vel, u)

        p_dot = pdot_from_w(p, omega)
        Jpp = jax.jacfwd(pdot_from_w, argnums=0)(p, omega)
        Jpw = jax.jacfwd(pdot_from_w, argnums=1)(p, omega)

        Z33 = jnp.zeros((3, 3), x.dtype)
        if reference_kinematics:
            r_dot = v_lin                       # the reference's ṙ = v quirk
            Jrp = Z33
            Jrv = jnp.eye(3, dtype=x.dtype)
        else:
            R = quat_to_rotmat(quat)
            r_dot = R @ v_lin
            # ∂(R(q(p)) v)/∂p via the chart chain rule.
            Jrp = jax.jacfwd(
                lambda pp: quat_to_rotmat(q_from_p(pp)) @ v_lin)(p)
            Jrv = R
        theta_dot = vel[6:]

        f = jnp.concatenate([p_dot, r_dot, theta_dot, vdot])

        # Assemble Fx row blocks: [ṗ; ṙ; θ̇; v̇] × [p, r, θ, ω, v, θ̇].
        Znj = jnp.zeros((3, nj), x.dtype)
        row_p = jnp.concatenate(
            [Jpp, Z33, Znj, Jpw, Z33, Znj], axis=1)
        row_r = jnp.concatenate(
            [Jrp, Z33, Znj, Z33, Jrv, Znj], axis=1)
        row_t = jnp.concatenate(
            [jnp.zeros((nj, nv + 6), x.dtype), jnp.eye(nj, dtype=x.dtype)],
            axis=1)
        # v̇ rows: ∂v̇/∂p = ∂v̇/∂quat · ∂quat/∂p; r, θ map straight through.
        row_v = jnp.concatenate(
            [dvd_dq[:, :4] @ Jqp, dvd_dq[:, 4:7], dvd_dq[:, 7:7 + nj],
             dvd_dv], axis=1)
        Fx = jnp.concatenate([row_p, row_r, row_t, row_v], axis=0)

        Fu = jnp.concatenate([jnp.zeros((nv, nv), x.dtype), Minv], axis=0)
        return f, Fx, Fu

    return stage


def make_rbd_dynamics_jacobians(mech: Mechanism, dt: float = 0.01,
                                reference_kinematics: bool = False,
                                explicit_derivatives=None):
    """Analytic ``(A, B) = (∂x'/∂x, ∂x'/∂u)`` of the RK4 step — the custom
    ``Problem.dynamics_jacobians`` override for the RBD model.

    ``jacfwd`` of the full RK4 dynamics pushes all n + m = 2nv + nv basis
    tangents through every integrator stage; the u-columns' tangents are
    structurally zero at the RNEA input of stage 1 and the chart rows never
    depend on u, but one-hot basis tangents are opaque to XLA so all that
    zero work is still computed.  This closure instead builds per-stage
    Jacobians and composes them with the RK4 chain rule:

    * per stage, ``(f_c, Fx [n, n], Fu [n, m])`` from
      :func:`make_rbd_stage_jacobians` — the explicit Carpentier-Mansard
      ∂RNEA/∂q, ∂RNEA/∂v matrix-recursion sweep (one pass producing every
      partial, sharing the primal Cholesky factor with the forward-
      dynamics solve and with ``Fu = [0; M⁻¹]``); with
      ``explicit_derivatives=False``, the r4 path (one ``jvp`` replay per
      state basis vector through the analytic fd-JVP) — kept for A/B and
      the equivalence test;
    * chain rule: ``K1x = dt·F1x``, ``K2x = dt·F2x (I + K1x/2)``,
      ``K3x = dt·F3x (I + K2x/2)``, ``K4x = dt·F4x (I + K3x)``,
      ``A = I + (K1x + 2K2x + 2K3x + K4x)/6`` (and the matching ``u``
      recursion with the stage ``Fu`` forcing terms) — tiny [n, n]
      matmuls that vectorize over scenario lanes.

    Algebraically identical to ``jacfwd`` of :func:`make_rbd_dynamics`
    (chain rule), equal to it numerically up to rounding; tested against
    it in tests/test_rbd_analytic_jvp.py.
    """

    nv = mech.nv
    nj = nv - 6
    n = 2 * nv

    if explicit_derivatives is None:
        # Measured on-chip (BENCH.md round 5): the per-basis-vector JVP
        # replay is the faster sweep on BOTH sides of the scalar-algebra
        # gate (2-DoF floating arm: 108 vs 468 ms/app through the scalar
        # tangent DAG; 6-DoF arm: 28 vs 44 ms/app through the matrix
        # one) — XLA fuses the replayed tangent graph into a few wide
        # elementwise programs that beat the explicit recursion's many
        # small matmuls.  The explicit sweep stays available for
        # compile-time-sensitive uses (it compiles ~5x faster).
        explicit_derivatives = False

    if explicit_derivatives:
        stage_all = make_rbd_stage_jacobians(
            mech, reference_kinematics=reference_kinematics)
    else:
        from ilqr_tpu.ops.linalg import (
            cholesky_small,
            solve_tri_lower,
            solve_tri_upper,
        )

        from ilqr_tpu.models.rbd.dynamics import crba_for

        continuous_dynamics = make_rbd_continuous_dynamics(
            mech, reference_kinematics=reference_kinematics,
            analytic_derivatives=True)

        def stage_val_and_fx(x, u):
            """``(f_c(x, u), ∂f_c/∂x [n, n])`` in one n-tangent sweep (the
            primal is shared across tangents by vmap, computed once)."""

            def jvp_one(v):
                return jax.jvp(lambda xx: continuous_dynamics(xx, u),
                               (x,), (v,))

            basis = jnp.eye(n, dtype=x.dtype)
            val, rows = jax.vmap(jvp_one, out_axes=(None, 0))(basis)
            return val, rows.T   # rows are ∂f/∂x · e_i → columns of Fx

        def stage_fu(x):
            """``∂f_c/∂u = [0; M(q)^{-1}] [n, m]`` (chart rows never see
            u)."""

            p = x[0:3]
            q_mech = jnp.concatenate([q_from_p(p), x[3:6], x[6:6 + nj]])
            M = crba_for(mech, q_mech)
            L = cholesky_small(M)
            Minv = solve_tri_upper(
                jnp.swapaxes(L, -1, -2),
                solve_tri_lower(L, jnp.eye(nv, dtype=x.dtype)))
            return jnp.concatenate(
                [jnp.zeros((nv, nv), x.dtype), Minv], axis=0)

        def stage_all(x, u):
            f, Fx = stage_val_and_fx(x, u)
            return f, Fx, stage_fu(x)

    def dynamics_jacobians(x, u):
        eye = jnp.eye(n, dtype=x.dtype)

        f1, F1, G1 = stage_all(x, u)
        x2 = x + dt * f1 / 2.0
        f2, F2, G2 = stage_all(x2, u)
        x3 = x + dt * f2 / 2.0
        f3, F3, G3 = stage_all(x3, u)
        x4 = x + dt * f3
        _f4, F4, G4 = stage_all(x4, u)

        K1x = dt * F1
        K2x = dt * (F2 @ (eye + K1x / 2.0))
        K3x = dt * (F3 @ (eye + K2x / 2.0))
        K4x = dt * (F4 @ (eye + K3x))
        A = eye + (K1x + 2.0 * K2x + 2.0 * K3x + K4x) / 6.0

        K1u = dt * G1
        K2u = dt * (F2 @ (K1u / 2.0) + G2)
        K3u = dt * (F3 @ (K2u / 2.0) + G3)
        K4u = dt * (F4 @ K3u + G4)
        B = (K1u + 2.0 * K2u + 2.0 * K3u + K4u) / 6.0
        return A, B

    return dynamics_jacobians


def make_rbd_arm_problem(target_pose: Optional[Sequence[float]] = None,
                         urdf_path: str = TWO_DOF_ARM_URDF,
                         dt: float = 0.01,
                         terminal_weight: float = 1e5,
                         reference_kinematics: bool = False,
                         analytic_derivatives: bool = True,
                         analytic_jacobians: bool = True,
                         explicit_derivatives=None) -> Problem:
    """The reference's floating-base 2-DoF arm swing-up
    (animate_RBD_2_link.jl:8-10 + RBD_helper_functions.jl:85-116):
    zero gravity, pose target [MRP(3), position(3), joints(2)], diagonal
    pose/torque weights, heavy terminal weight."""

    mech = parse_urdf(urdf_path, floating=True, gravity=(0.0, 0.0, 0.0))
    nj = mech.nv - 6
    npose = 6 + nj
    if target_pose is None:
        # The example's target (animate_RBD_2_link.jl:10).
        target_pose = [0.0, 0.0, 0.0, 5.0, 1.0, 2.0, 1.0, 0.3]
    target = jnp.asarray(target_pose)
    assert target.shape == (npose,)

    dynamics = make_rbd_dynamics(mech, dt=dt,
                                 reference_kinematics=reference_kinematics,
                                 analytic_derivatives=analytic_derivatives)
    jacobians = (make_rbd_dynamics_jacobians(
        mech, dt=dt, reference_kinematics=reference_kinematics,
        explicit_derivatives=explicit_derivatives)
        if analytic_jacobians else None)

    # Diagonal weights from RBD_helper_functions.jl:88-116.
    q_weights = jnp.asarray([100.0] * 3 + [1.0] * 3 + [10.0] * nj)
    r_weights = jnp.asarray([1.0] * 3 + [100.0] * 3 + [10.0] * nj)
    qf_weights = jnp.asarray([100.0] * 3 + [1000.0] * 3 + [10.0] * nj)

    def immediate_cost(x, u):
        dx = target - x[:npose]
        return 10.0 * jnp.sum(q_weights * dx * dx) + jnp.sum(r_weights * u * u)

    def final_cost(x):
        dx = target - x[:npose]
        return terminal_weight * jnp.sum(qf_weights * dx * dx)

    return Problem(
        dynamics=dynamics,
        cost=immediate_cost,
        final_cost=final_cost,
        state_dim=2 * mech.nv,
        control_dim=mech.nv,
        name="rbd_2dof_arm",
        dynamics_jacobians=jacobians,
    )
