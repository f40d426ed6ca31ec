"""CRBA mass matrix + RNEA bias forces over a static kinematic tree.

Differentiable replacements for the two RigidBodyDynamics.jl calls the
reference's model makes per dynamics evaluation —
``mass_matrix(state)`` and ``dynamics_bias(state)``
(RBD_helper_functions.jl:61-66) — implemented as the Composite Rigid Body
Algorithm and the Recursive Newton-Euler Algorithm respectively
(Featherstone, "Rigid Body Dynamics Algorithms", ch. 5-6).  The tree loops
unroll at trace time (bodies are few and static), every arithmetic op is a
jnp op, so both algorithms jit, vmap over scenario batches, and
differentiate with jacfwd — the property the whole iLQR stack relies on.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ilqr_tpu.models.rbd.rotations import (
    axis_angle_to_rotmat,
    quat_to_rotmat,
    rpy_to_rotmat,
    skew,
)
from ilqr_tpu.models.rbd.spatial import (
    crf,
    crm,
    spatial_inertia,
    xform_from_pose,
)
from ilqr_tpu.models.rbd.urdf import Mechanism


def _joint_X_and_S(joint, q, dtype):
    """Child-frame-from-parent-frame motion transform and motion subspace.

    Returns ``(X_up [6,6], S [6, dof], R_world_child_contrib)`` where
    ``X_up`` maps motion vectors from the parent link frame into the child
    link frame at configuration ``q`` (the joint's slice of the global
    configuration vector).
    """

    # Fixed frame of the joint in the parent link (URDF origin).
    R_origin = rpy_to_rotmat(jnp.asarray(joint.origin_rpy, dtype))
    p_origin = jnp.asarray(joint.origin_xyz, dtype)

    if joint.joint_type in ("revolute", "continuous"):
        axis = jnp.asarray(joint.axis, dtype)
        R_j = axis_angle_to_rotmat(axis, q[0])
        R = R_origin @ R_j          # child axes in parent coords
        p = p_origin                # child origin in parent coords
        S = jnp.concatenate([axis, jnp.zeros(3, dtype)])[:, None]
    elif joint.joint_type == "prismatic":
        axis = jnp.asarray(joint.axis, dtype)
        R = R_origin
        p = p_origin + R_origin @ (axis * q[0])
        S = jnp.concatenate([jnp.zeros(3, dtype), axis])[:, None]
    elif joint.joint_type == "fixed":
        R = R_origin
        p = p_origin
        S = jnp.zeros((6, 0), dtype)
    elif joint.joint_type == "floating":
        # q = [quat (4, scalar-first), pos (3)]; velocity [ω; v] in child
        # (body) coordinates — RigidBodyDynamics.jl QuaternionFloating
        # convention.
        R_b = quat_to_rotmat(q[:4])
        R = R_origin @ R_b
        p = p_origin + R_origin @ q[4:7]
        S = jnp.eye(6, dtype=dtype)
    else:
        raise ValueError(f"unsupported joint type {joint.joint_type}")

    return xform_from_pose(R, p), S


def _tree_quantities(mech: Mechanism, q, dtype):
    """Per-body (X_up, S) along the tree."""

    Xups: List = []
    Ss: List = []
    for i, joint in enumerate(mech.joints):
        lo, hi = mech.q_slices[i]
        Xup, S = _joint_X_and_S(joint, q[lo:hi], dtype)
        Xups.append(Xup)
        Ss.append(S)
    return Xups, Ss


def _body_inertias(mech: Mechanism, dtype):
    return [
        spatial_inertia(
            jnp.asarray(link.mass, dtype),
            jnp.asarray(link.inertia, dtype),
            jnp.asarray(link.com, dtype),
        )
        for link in mech.links
    ]


def crba_mass_matrix(mech: Mechanism, q):
    """Joint-space mass matrix ``M(q) [nv, nv]`` (Composite Rigid Body
    Algorithm; equivalent of RigidBodyDynamics.jl ``mass_matrix``)."""

    dtype = q.dtype
    Xups, Ss = _tree_quantities(mech, q, dtype)
    Ic = list(_body_inertias(mech, dtype))

    n = mech.n_bodies
    # Accumulate composite inertias root-ward.
    for i in range(n - 1, -1, -1):
        p = mech.parents[i]
        if p >= 0:
            Ic[p] = Ic[p] + Xups[i].T @ Ic[i] @ Xups[i]

    H = [[None] * n for _ in range(n)]
    for i in range(n):
        Si = Ss[i]
        if Si.shape[1] == 0:
            continue
        F = Ic[i] @ Si
        H[i][i] = Si.T @ F
        j = i
        while mech.parents[j] >= 0:
            F = Xups[j].T @ F
            j = mech.parents[j]
            Sj = Ss[j]
            if Sj.shape[1] > 0:
                H[i][j] = F.T @ Sj

    nv = mech.nv
    M = jnp.zeros((nv, nv), dtype)
    for i in range(n):
        vi = mech.v_slices[i]
        if vi[1] == vi[0]:
            continue
        M = M.at[vi[0]:vi[1], vi[0]:vi[1]].set(H[i][i])
        for j in range(n):
            if j != i and H[i][j] is not None:
                vj = mech.v_slices[j]
                M = M.at[vi[0]:vi[1], vj[0]:vj[1]].set(H[i][j])
                M = M.at[vj[0]:vj[1], vi[0]:vi[1]].set(H[i][j].T)
    return M


def rnea_bias(mech: Mechanism, q, v):
    """Bias forces ``C(q, v) v + g(q) [nv]`` — the generalized forces needed
    to produce zero acceleration (RNEA with q̈ = 0; equivalent of
    RigidBodyDynamics.jl ``dynamics_bias``)."""

    dtype = q.dtype
    Xups, Ss = _tree_quantities(mech, q, dtype)
    Is = _body_inertias(mech, dtype)
    n = mech.n_bodies

    # Gravity enters as a fictitious base acceleration -g (world frame).
    a_grav = jnp.concatenate([
        jnp.zeros(3, dtype), -jnp.asarray(mech.gravity, dtype)])

    vs: List = [None] * n
    avp: List = [None] * n
    fs: List = [None] * n
    for i in range(n):
        p = mech.parents[i]
        lo, hi = mech.v_slices[i]
        vJ = Ss[i] @ v[lo:hi] if hi > lo else jnp.zeros(6, dtype)
        if p < 0:
            vs[i] = vJ
            avp[i] = Xups[i] @ a_grav
        else:
            vs[i] = Xups[i] @ vs[p] + vJ
            avp[i] = Xups[i] @ avp[p] + crm(vs[i]) @ vJ
        fs[i] = Is[i] @ avp[i] + crf(vs[i]) @ (Is[i] @ vs[i])

    tau = jnp.zeros(mech.nv, dtype)
    for i in range(n - 1, -1, -1):
        lo, hi = mech.v_slices[i]
        if hi > lo:
            tau = tau.at[lo:hi].set(Ss[i].T @ fs[i])
        p = mech.parents[i]
        if p >= 0:
            fs[p] = fs[p] + Xups[i].T @ fs[i]
    return tau


def rnea_inverse_dynamics(mech: Mechanism, q, v, a):
    """Full inverse dynamics ``tau = M(q) a + C(q, v) v + g(q) [nv]`` —
    RNEA with nonzero joint accelerations (Featherstone ch. 5; generalizes
    :func:`rnea_bias`, which is the ``a = 0`` special case).

    Built from the same ``Xup``/``S``/inertia quantities as the CRBA mass
    matrix, so the identity ``rnea_inverse_dynamics(q, v, a) ==
    crba_mass_matrix(q) @ a + rnea_bias(q, v)`` holds exactly for ANY raw
    coordinate vector ``q`` (unit quaternion or not) — the property the
    analytic forward-dynamics derivative rule below relies on.
    """

    dtype = q.dtype
    Xups, Ss = _tree_quantities(mech, q, dtype)
    Is = _body_inertias(mech, dtype)
    n = mech.n_bodies

    a_grav = jnp.concatenate([
        jnp.zeros(3, dtype), -jnp.asarray(mech.gravity, dtype)])

    vs: List = [None] * n
    as_: List = [None] * n
    fs: List = [None] * n
    for i in range(n):
        p = mech.parents[i]
        lo, hi = mech.v_slices[i]
        vJ = Ss[i] @ v[lo:hi] if hi > lo else jnp.zeros(6, dtype)
        aJ = Ss[i] @ a[lo:hi] if hi > lo else jnp.zeros(6, dtype)
        if p < 0:
            vs[i] = vJ
            as_[i] = Xups[i] @ a_grav + aJ
        else:
            vs[i] = Xups[i] @ vs[p] + vJ
            as_[i] = Xups[i] @ as_[p] + aJ + crm(vs[i]) @ vJ
        fs[i] = Is[i] @ as_[i] + crf(vs[i]) @ (Is[i] @ vs[i])

    tau = jnp.zeros(mech.nv, dtype)
    for i in range(n - 1, -1, -1):
        lo, hi = mech.v_slices[i]
        if hi > lo:
            tau = tau.at[lo:hi].set(Ss[i].T @ fs[i])
        p = mech.parents[i]
        if p >= 0:
            fs[p] = fs[p] + Xups[i].T @ fs[i]
    return tau


def _tree_quantities_scalar(mech: Mechanism, q):
    """Per-body ``(Xup, S)`` in scalar-list form (see ``scalar_ops``):
    ``Xup`` a 6x6 nested list of scalars, ``S`` a 6-row list with ``dof``
    float columns.  Same values as :func:`_tree_quantities`."""

    from ilqr_tpu.models.rbd import scalar_ops as so

    qs = [q[i] for i in range(mech.nq)]
    Xups, Ss = [], []
    for i, joint in enumerate(mech.joints):
        lo, hi = mech.q_slices[i]
        R0 = so.rpy_R_static(tuple(float(x) for x in joint.origin_rpy))
        p0 = [float(x) for x in joint.origin_xyz]
        if joint.joint_type in ("revolute", "continuous"):
            ax = [float(a) for a in joint.axis]
            R = so.mm(R0, so.axis_angle_R_l(ax, qs[lo]))
            p = p0
            S = [[ax[0]], [ax[1]], [ax[2]], [0.0], [0.0], [0.0]]
        elif joint.joint_type == "prismatic":
            ax = [float(a) for a in joint.axis]
            R = R0
            p = [p0[k] + sum(R0[k][j] * (ax[j] * qs[lo]) for j in range(3))
                 for k in range(3)]
            S = [[0.0], [0.0], [0.0], [ax[0]], [ax[1]], [ax[2]]]
        elif joint.joint_type == "fixed":
            R, p = R0, p0
            S = [[] for _ in range(6)]
        elif joint.joint_type == "floating":
            Rb = so.quat_to_R_l(qs[lo:lo + 4])
            R = so.mm(R0, Rb)
            p = [p0[k] + sum(R0[k][j] * qs[lo + 4 + j] for j in range(3))
                 for k in range(3)]
            S = [[1.0 if r == c else 0.0 for c in range(6)]
                 for r in range(6)]
        else:
            raise ValueError(f"unsupported joint type {joint.joint_type}")
        Xups.append(so.xform_from_pose_l(R, p))
        Ss.append(S)
    return Xups, Ss


def _body_inertias_scalar(mech: Mechanism):
    from ilqr_tpu.models.rbd import scalar_ops as so

    return [
        so.spatial_inertia_static(
            float(link.mass),
            [[float(link.inertia[a][b]) for b in range(3)]
             for a in range(3)],
            [float(c) for c in link.com],
        )
        for link in mech.links
    ]


def crba_mass_matrix_scalar(mech: Mechanism, q):
    """Scalar-expression CRBA — identical values to
    :func:`crba_mass_matrix`, one fusable DAG (no stack/scatter until the
    final [nv, nv] assembly)."""

    from ilqr_tpu.models.rbd import scalar_ops as so

    Xups, Ss = _tree_quantities_scalar(mech, q)
    Ic = list(_body_inertias_scalar(mech))
    n = mech.n_bodies

    for i in range(n - 1, -1, -1):
        p = mech.parents[i]
        if p >= 0:
            XtIX = so.mm(so.mT(Xups[i]), so.mm(Ic[i], Xups[i]))
            Ic[p] = [[Ic[p][a][b] + XtIX[a][b] for b in range(6)]
                     for a in range(6)]

    H = [[None] * n for _ in range(n)]
    for i in range(n):
        Si = Ss[i]
        dof_i = len(Si[0])
        if dof_i == 0:
            continue
        F = so.mm(Ic[i], Si)                      # [6, dof_i]
        H[i][i] = so.mm(so.mT(Si), F)
        j = i
        while mech.parents[j] >= 0:
            F = so.mm(so.mT(Xups[j]), F)
            j = mech.parents[j]
            Sj = Ss[j]
            if len(Sj[0]) > 0:
                H[i][j] = so.mm(so.mT(F), Sj)     # [dof_i, dof_j]

    nv = mech.nv
    zero = q[0] * 0.0
    M = [[zero for _ in range(nv)] for _ in range(nv)]
    for i in range(n):
        lo_i, hi_i = mech.v_slices[i]
        if hi_i == lo_i:
            continue
        for a in range(hi_i - lo_i):
            for b in range(hi_i - lo_i):
                M[lo_i + a][lo_i + b] = H[i][i][a][b]
        for j in range(n):
            if j != i and H[i][j] is not None:
                lo_j, hi_j = mech.v_slices[j]
                for a in range(hi_i - lo_i):
                    for b in range(hi_j - lo_j):
                        M[lo_i + a][lo_j + b] = H[i][j][a][b]
                        M[lo_j + b][lo_i + a] = H[i][j][a][b]
    return jnp.stack([jnp.stack([M[a][b] + zero for b in range(nv)])
                      for a in range(nv)])


def rnea_inverse_dynamics_scalar(mech: Mechanism, q, v, a):
    """Scalar-expression RNEA — identical values to
    :func:`rnea_inverse_dynamics` (``a = None`` gives the bias,
    :func:`rnea_bias`)."""

    from ilqr_tpu.models.rbd import scalar_ops as so

    Xups, Ss = _tree_quantities_scalar(mech, q)
    Is = _body_inertias_scalar(mech)
    n = mech.n_bodies
    vs_in = [v[i] for i in range(mech.nv)]
    as_in = None if a is None else [a[i] for i in range(mech.nv)]

    g = [float(x) for x in mech.gravity]
    a_grav = [0.0, 0.0, 0.0, -g[0], -g[1], -g[2]]
    zero = q[0] * 0.0

    vs = [None] * n
    acc = [None] * n
    fs = [None] * n
    for i in range(n):
        p = mech.parents[i]
        lo, hi = mech.v_slices[i]
        dof = hi - lo
        if dof:
            vJ = [sum(Ss[i][r][c] * vs_in[lo + c] for c in range(dof))
                  for r in range(6)]
            aJ = ([sum(Ss[i][r][c] * as_in[lo + c] for c in range(dof))
                   for r in range(6)] if as_in is not None else [0.0] * 6)
        else:
            vJ = [zero] * 6
            aJ = [0.0] * 6
        if p < 0:
            vs[i] = vJ
            acc[i] = so.vadd(so.mv(Xups[i], a_grav), aJ)
        else:
            vs[i] = so.vadd(so.mv(Xups[i], vs[p]), vJ)
            acc[i] = so.vadd(so.vadd(so.mv(Xups[i], acc[p]), aJ),
                             so.mv(so.crm_l(vs[i]), vJ))
        Iv = so.mv(Is[i], vs[i])
        fs[i] = so.vadd(so.mv(Is[i], acc[i]), so.mv(so.crf_l(vs[i]), Iv))

    tau = [zero] * mech.nv
    for i in range(n - 1, -1, -1):
        lo, hi = mech.v_slices[i]
        for c in range(hi - lo):
            tau[lo + c] = sum(Ss[i][r][c] * fs[i][r] for r in range(6))
        p = mech.parents[i]
        if p >= 0:
            fs[p] = so.vadd(fs[p], so.mv(so.mT(Xups[i]), fs[i]))
    return jnp.stack(tau)


def rnea_bias_scalar(mech: Mechanism, q, v):
    """Scalar-expression bias forces (RNEA with zero acceleration)."""

    return rnea_inverse_dynamics_scalar(mech, q, v, None)


# Scalar expression DAGs trade stacking (fusion boundaries) for graph
# size: the op count grows with the tree, and past a handful of bodies
# the giant unstructured graph makes XLA compiles pathological (the
# 6-DoF arm's rollout compile ran >40 min on CPU where the matrix form
# takes seconds).  The production 2-DoF floating arm (3 moving bodies)
# is comfortably under the threshold.
_SCALAR_MAX_BODIES = 4


def use_scalar_algebra(mech: Mechanism) -> bool:
    return mech.n_bodies <= _SCALAR_MAX_BODIES


def crba_for(mech: Mechanism, q):
    """Size-gated CRBA: scalar DAG for small trees, matrix form beyond."""

    if use_scalar_algebra(mech):
        return crba_mass_matrix_scalar(mech, q)
    return crba_mass_matrix(mech, q)


def rnea_bias_for(mech: Mechanism, q, v):
    if use_scalar_algebra(mech):
        return rnea_bias_scalar(mech, q, v)
    return rnea_bias(mech, q, v)


def rnea_inverse_dynamics_for(mech: Mechanism, q, v, a):
    if use_scalar_algebra(mech):
        return rnea_inverse_dynamics_scalar(mech, q, v, a)
    return rnea_inverse_dynamics(mech, q, v, a)


def forward_dynamics(mech: Mechanism, q, v, tau):
    """``v̇ = M(q)^{-1} (tau - bias(q, v))`` via CRBA + RNEA + the unrolled
    SPD solve (the reference's ``v̇ = M \\ (-dynamics_bias + u)``,
    RBD_helper_functions.jl:65)."""

    from ilqr_tpu.ops.linalg import solve_psd_small

    # Scalar-expression algorithms for small trees (identical values,
    # fusable DAG — see scalar_ops; equality tested in test_rbd.py).
    M = crba_for(mech, q)
    bias = rnea_bias_for(mech, q, v)
    return solve_psd_small(M, tau - bias)


def _crf_bar(m):
    """The 6x6 matrix ``B(m)`` with ``B(m) @ d == crf(d) @ m`` for all
    ``d`` — the force cross product re-expressed as a linear operator in
    its FIRST argument (used to differentiate ``crf(v) I v`` w.r.t. v).

    With ``crf([w; l]) = [[skew(w), skew(l)], [0, skew(w)]]`` and
    ``skew(a) b = -skew(b) a``:

        crf(d) m = [[-skew(m_ang), -skew(m_lin)], [-skew(m_lin), 0]] d
    """

    Sa = skew(m[:3])
    Sl = skew(m[3:])
    Z = jnp.zeros((3, 3), dtype=m.dtype)
    return jnp.block([[-Sa, -Sl], [-Sl, Z]])


def _joint_dX(joint, qj, dtype):
    """``∂Xup/∂q_joint`` as a ``[6, 6, dof_q]`` tensor (closed-form via
    jacfwd of the single joint's transform — a tiny trig/polynomial
    function of at most 7 coordinates)."""

    import jax

    if joint.joint_type == "fixed" or qj.shape[0] == 0:
        return jnp.zeros((6, 6, qj.shape[0]), dtype)
    return jax.jacfwd(lambda qq: _joint_X_and_S(joint, qq, dtype)[0])(qj)


def rnea_derivatives(mech: Mechanism, q, v, a):
    """``(tau, ∂tau/∂q [nv, nq], ∂tau/∂v [nv, nv])`` of
    :func:`rnea_inverse_dynamics` in ONE forward/backward matrix-recursion
    sweep — the explicit analytic inverse-dynamics derivative algorithm of
    Carpentier & Mansard ("Analytical derivatives of rigid body dynamics
    algorithms", RSS 2018), in place of replaying the RNEA JVP over
    nq + nv one-hot tangents.

    The tangent of every per-body quantity is carried as a dense
    ``[6, w]`` matrix over all ``w = nq + nv`` directions at once
    (columns ``0:nq`` are q-directions, ``nq:`` are v-directions), so the
    whole sweep is ~6 small matmuls per body instead of ``w`` replays of
    the full recursion.  Configuration enters only through each joint's
    ``Xup(q)`` (every supported joint's motion subspace ``S`` is constant
    in body coordinates — including the floating joint's ``S = I``), via
    the closed-form ``∂Xup/∂q`` of :func:`_joint_dX`.  Exactly the
    derivative of the coded :func:`rnea_inverse_dynamics` (same root
    special case, raw-coordinate quaternion — no chart projection), which
    tests/test_rbd_analytic_jvp.py checks against ``jacfwd``.
    """

    dtype = q.dtype
    Xups, Ss = _tree_quantities(mech, q, dtype)
    Is = _body_inertias(mech, dtype)
    n = mech.n_bodies
    nq, nv = mech.nq, mech.nv
    w = nq + nv

    a_grav = jnp.concatenate([
        jnp.zeros(3, dtype), -jnp.asarray(mech.gravity, dtype)])

    vs: List = [None] * n
    acc: List = [None] * n
    fs: List = [None] * n
    Dv: List = [None] * n
    Da: List = [None] * n
    Df: List = [None] * n

    for i in range(n):
        p = mech.parents[i]
        lo, hi = mech.v_slices[i]
        lq, hq = mech.q_slices[i]
        Si = Ss[i]
        dof = hi - lo
        dX = _joint_dX(mech.joints[i], q[lq:hq], dtype)   # [6, 6, dof_q]

        vJ = Si @ v[lo:hi] if dof else jnp.zeros(6, dtype)
        aJ = Si @ a[lo:hi] if dof else jnp.zeros(6, dtype)

        DvJ = jnp.zeros((6, w), dtype)
        if dof:
            DvJ = DvJ.at[:, nq + lo:nq + hi].set(Si)

        if p < 0:
            # Root body: v = vJ, a = Xup a_grav + aJ (a fixed ⇒ δaJ = 0).
            vs[i] = vJ
            acc[i] = Xups[i] @ a_grav + aJ
            Dv[i] = DvJ
            Da[i] = jnp.zeros((6, w), dtype)
            if hq > lq:
                Da[i] = Da[i].at[:, lq:hq].set(
                    jnp.einsum("abk,b->ak", dX, a_grav))
        else:
            vs[i] = Xups[i] @ vs[p] + vJ
            acc[i] = Xups[i] @ acc[p] + aJ + crm(vs[i]) @ vJ
            Dv[i] = Xups[i] @ Dv[p] + DvJ
            if hq > lq:
                Dv[i] = Dv[i].at[:, lq:hq].add(
                    jnp.einsum("abk,b->ak", dX, vs[p]))
            # δ(crm(v_i) vJ) = -crm(vJ) δv_i + crm(v_i) S_i δν_i, with
            # δv_i the FULL tangent (incl. this joint's δXup v_p columns).
            Da[i] = (Xups[i] @ Da[p] - crm(vJ) @ Dv[i])
            if dof:
                Da[i] = Da[i].at[:, nq + lo:nq + hi].add(crm(vs[i]) @ Si)
            if hq > lq:
                Da[i] = Da[i].at[:, lq:hq].add(
                    jnp.einsum("abk,b->ak", dX, acc[p]))

        fs[i] = Is[i] @ acc[i] + crf(vs[i]) @ (Is[i] @ vs[i])
        # δf = I δa + crf(δv)(I v) + crf(v) I δv.
        Df[i] = Is[i] @ Da[i] + (
            _crf_bar(Is[i] @ vs[i]) + crf(vs[i]) @ Is[i]) @ Dv[i]

    tau = jnp.zeros(nv, dtype)
    Dtau = jnp.zeros((nv, w), dtype)
    for i in range(n - 1, -1, -1):
        lo, hi = mech.v_slices[i]
        lq, hq = mech.q_slices[i]
        if hi > lo:
            tau = tau.at[lo:hi].set(Ss[i].T @ fs[i])
            Dtau = Dtau.at[lo:hi, :].set(Ss[i].T @ Df[i])
        p = mech.parents[i]
        if p >= 0:
            fs[p] = fs[p] + Xups[i].T @ fs[i]
            Dfp = Xups[i].T @ Df[i]
            if hq > lq:
                # δ(Xupᵀ) f = (δXup)ᵀ f — q-columns of this joint only.
                dX = _joint_dX(mech.joints[i], q[lq:hq], dtype)
                Dfp = Dfp.at[:, lq:hq].add(
                    jnp.einsum("abk,a->bk", dX, fs[i]))
            Df[p] = Df[p] + Dfp
    return tau, Dtau[:, :nq], Dtau[:, nq:]


def forward_dynamics_derivatives(mech: Mechanism, q, v, tau):
    """``(v̇, ∂v̇/∂q [nv, nq], ∂v̇/∂v [nv, nv], M⁻¹ [nv, nv])`` in one
    sweep: CRBA + ONE Cholesky + RNEA + the explicit
    :func:`rnea_derivatives`, then the Carpentier-Mansard implicit rule

        ∂v̇/∂z = -M(q)⁻¹ ∂RNEA(q, v, a)/∂z |_{a = v̇}   (z ∈ {q, v})
        ∂v̇/∂tau = M(q)⁻¹

    with every right-hand side solved against the PRIMAL factor.  The
    ``M⁻¹`` return doubles as ``∂v̇/∂tau`` (the reference's control enters
    only as ``tau``, RBD_helper_functions.jl:65)."""

    from ilqr_tpu.ops.linalg import (
        cholesky_small,
        solve_tri_lower,
        solve_tri_upper,
    )

    M = crba_for(mech, q)
    L = cholesky_small(M)

    def chol_solve(b):
        return solve_tri_upper(jnp.swapaxes(L, -1, -2),
                               solve_tri_lower(L, b))

    bias = rnea_bias_for(mech, q, v)
    vdot = chol_solve(tau - bias)
    _, dtau_dq, dtau_dv = rnea_derivatives(mech, q, v, vdot)
    nv = mech.nv
    # One solve over all nq + nv + nv right-hand sides.
    rhs = jnp.concatenate(
        [dtau_dq, dtau_dv, -jnp.eye(nv, dtype=q.dtype)], axis=1)
    sol = chol_solve(rhs)
    dvd_dq = -sol[:, :mech.nq]
    dvd_dv = -sol[:, mech.nq:mech.nq + nv]
    Minv = -sol[:, mech.nq + nv:]
    return vdot, dvd_dq, dvd_dv, Minv


def make_forward_dynamics_analytic_jvp(mech: Mechanism):
    """Forward dynamics with the analytic derivative rule of Carpentier &
    Mansard ("Analytical derivatives of rigid body dynamics algorithms",
    RSS 2018): differentiate the INVERSE dynamics at the computed
    acceleration instead of differentiating CRBA + Cholesky + solve.

    From ``RNEA(q, v, v̇) = tau``, implicit differentiation gives

        ∂v̇/∂z = -M(q)^{-1} · ∂RNEA(q, v, a)/∂z |_{a = v̇}      (z ∈ {q, v})
        ∂v̇/∂tau =  M(q)^{-1}

    so a JVP costs one RNEA-JVP plus one pair of triangular solves against
    the PRIMAL Cholesky factor — no tangent ever propagates through the
    composite-inertia accumulation (the expensive half of CRBA) or the
    factorization.  Under ``jacfwd`` the primal (CRBA + RNEA + Cholesky)
    is computed once, unbatched, and only the cheap tangent rule
    replicates over the n+m basis vectors; measured on the floating-base
    arm this more than halves the iLQR derivative-sweep cost that
    dominates RBD solve time (BENCH.md round 3).

    Returns ``fd(q, v, tau) -> v̇`` — same values as
    :func:`forward_dynamics` (identical primal code), custom JVP.
    """

    import jax

    from ilqr_tpu.ops.linalg import (
        cholesky_small,
        solve_tri_lower,
        solve_tri_upper,
    )

    def _chol_solve(L, b):
        return solve_tri_upper(jnp.swapaxes(L, -1, -2),
                               solve_tri_lower(L, b))

    @jax.custom_jvp
    def fd(q, v, tau):
        return forward_dynamics(mech, q, v, tau)

    @fd.defjvp
    def fd_jvp(primals, tangents):
        q, v, tau = primals
        dq, dv, dtau = tangents
        M = crba_for(mech, q)
        L = cholesky_small(M)
        bias = rnea_bias_for(mech, q, v)
        vdot = _chol_solve(L, tau - bias)
        # JVP of inverse dynamics at FIXED a = v̇ (vdot is a closure
        # constant here, so no tangent flows into the acceleration).
        # Scalar-expression RNEA for small trees: the tangent graph is a
        # fusable scalar DAG instead of a stack/concat-heavy one (1.8x on
        # this sweep, BENCH.md round 4).
        _, dtau_id = jax.jvp(
            lambda q_, v_: rnea_inverse_dynamics_for(mech, q_, v_, vdot),
            (q, v), (dq, dv))
        dvdot = _chol_solve(L, dtau - dtau_id)
        return vdot, dvdot

    return fd
