"""Analytic forward-dynamics derivatives (Carpentier-Mansard custom JVP).

The rule ∂v̇/∂z = -M⁻¹ ∂RNEA(q,v,a)/∂z |_{a=v̇} is exact for raw
coordinates, so jacfwd through the custom-JVP dynamics must equal plain AD
through CRBA + Cholesky + solve to rounding — on the full RK4 discrete
dynamics, not just one continuous evaluation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.models.rbd.dynamics import (
    crba_mass_matrix,
    rnea_bias,
    rnea_inverse_dynamics,
)
from ilqr_tpu.models.rbd.model import TWO_DOF_ARM_URDF, make_rbd_dynamics
from ilqr_tpu.models.rbd.urdf import parse_urdf


def _mech():
    return parse_urdf(TWO_DOF_ARM_URDF, floating=True,
                      gravity=(0.0, 0.0, 0.0))


def _random_state(key, nv, dtype=jnp.float64):
    kq, kv, ku = jax.random.split(key, 3)
    # Raw (unnormalized-quaternion-free) MRP state used by the model chart.
    x = 0.3 * jax.random.normal(kq, (2 * nv,), dtype)
    u = jax.random.normal(ku, (nv,), dtype)
    return x, u


def test_rnea_inverse_dynamics_identity():
    """RNEA(q,v,a) == M(q) a + bias(q,v) exactly, for arbitrary raw q."""

    mech = _mech()
    key = jax.random.PRNGKey(0)
    for i in range(3):
        kq, kv, ka, key = jax.random.split(jax.random.fold_in(key, i), 4)
        q = jax.random.normal(kq, (mech.nq,), jnp.float64)
        v = jax.random.normal(kv, (mech.nv,), jnp.float64)
        a = jax.random.normal(ka, (mech.nv,), jnp.float64)
        tau = rnea_inverse_dynamics(mech, q, v, a)
        want = crba_mass_matrix(mech, q) @ a + rnea_bias(mech, q, v)
        np.testing.assert_allclose(np.asarray(tau), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


def test_analytic_jvp_matches_plain_ad():
    """jacfwd of the RK4 discrete dynamics: custom JVP == plain AD."""

    mech = _mech()
    dyn_analytic = make_rbd_dynamics(mech, analytic_derivatives=True)
    dyn_plain = make_rbd_dynamics(mech, analytic_derivatives=False)

    key = jax.random.PRNGKey(1)
    for i in range(2):
        x, u = _random_state(jax.random.fold_in(key, i), mech.nv)
        np.testing.assert_allclose(
            np.asarray(dyn_analytic(x, u)), np.asarray(dyn_plain(x, u)),
            rtol=1e-12, atol=1e-12)
        A1, B1 = jax.jacfwd(dyn_analytic, argnums=(0, 1))(x, u)
        A2, B2 = jax.jacfwd(dyn_plain, argnums=(0, 1))(x, u)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B2),
                                   rtol=1e-9, atol=1e-11)


def test_analytic_jvp_vmaps():
    """The custom JVP composes with vmap + jacfwd (the solver's usage)."""

    mech = _mech()
    dyn = make_rbd_dynamics(mech, analytic_derivatives=True)
    key = jax.random.PRNGKey(2)
    xs = 0.2 * jax.random.normal(key, (5, 2 * mech.nv), jnp.float64)
    us = jax.random.normal(key, (5, mech.nv), jnp.float64)
    As, Bs = jax.vmap(jax.jacfwd(dyn, argnums=(0, 1)))(xs, us)
    assert As.shape == (5, 2 * mech.nv, 2 * mech.nv)
    assert Bs.shape == (5, 2 * mech.nv, mech.nv)
    assert bool(jnp.all(jnp.isfinite(As))) and bool(jnp.all(jnp.isfinite(Bs)))


def test_analytic_rk4_jacobians_match_jacfwd():
    """make_rbd_dynamics_jacobians (per-stage Fx/Fu + RK4 chain rule, with
    the tau block taken directly as M^{-1}) equals jacfwd of the full RK4
    dynamics to rounding, at random raw states."""

    from ilqr_tpu.models.rbd.model import make_rbd_dynamics_jacobians

    mech = _mech()
    dyn = make_rbd_dynamics(mech, analytic_derivatives=False)
    jac_ref = jax.jit(jax.jacfwd(dyn, argnums=(0, 1)))
    jac_new = jax.jit(make_rbd_dynamics_jacobians(mech))

    key = jax.random.PRNGKey(3)
    for i in range(3):
        key, k = jax.random.split(key)
        x, u = _random_state(k, mech.nv)
        A0, B0 = jac_ref(x, u)
        A1, B1 = jac_new(x, u)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B0),
                                   rtol=1e-10, atol=1e-12)


def test_analytic_rk4_jacobians_vmap_batch_last():
    """The override vmaps batch-last exactly as derivatives_bl uses it."""

    from ilqr_tpu.models.rbd.model import make_rbd_dynamics_jacobians

    mech = _mech()
    jac = make_rbd_dynamics_jacobians(mech)
    jac_bl = jax.vmap(jac, in_axes=(-1, -1), out_axes=-1)
    key = jax.random.PRNGKey(5)
    xs = 0.2 * jax.random.normal(key, (2 * mech.nv, 4))
    us = 0.5 * jax.random.normal(key, (mech.nv, 4))
    As, Bs = jax.jit(jac_bl)(xs, us)
    assert As.shape == (2 * mech.nv, 2 * mech.nv, 4)
    assert Bs.shape == (2 * mech.nv, mech.nv, 4)
    A0, B0 = jac(xs[:, 2], us[:, 2])
    np.testing.assert_allclose(np.asarray(As[..., 2]), np.asarray(A0),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bs[..., 2]), np.asarray(B0),
                               rtol=1e-10, atol=1e-12)


def test_rbd_problem_wires_jacobian_override():
    """make_rbd_arm_problem exposes the analytic jacobians by default and
    derivatives_bl produces the same local models either way."""

    from ilqr_tpu import batched as bl
    from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
    from ilqr_tpu.problem import rollout

    p_ana = make_rbd_arm_problem()
    p_ad = make_rbd_arm_problem(analytic_jacobians=False)
    assert p_ana.dynamics_jacobians is not None
    assert p_ad.dynamics_jacobians is None

    x0 = jnp.concatenate([
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.5, 0.75, 1.0]),
        jnp.zeros(2), jnp.zeros(8)])
    us = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (5, 8))
    xs = rollout(p_ad.dynamics, x0, us)
    xs_bl = xs[:, :, None] + jnp.zeros((1, 1, 3))
    us_bl = us[:, :, None] + jnp.zeros((1, 1, 3))
    m_ana = bl.derivatives_bl(p_ana, xs_bl, us_bl)
    m_ad = bl.derivatives_bl(p_ad, xs_bl, us_bl)
    for a, b in zip(m_ana, m_ad):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11)


def test_rnea_derivatives_match_jacfwd():
    """The explicit Carpentier-Mansard one-sweep ∂RNEA/∂q, ∂RNEA/∂v matrix
    recursion equals jacfwd of the coded RNEA to rounding — on the
    floating-base 2-DoF arm AND the 6-DoF arm (fixed and floating base),
    with gravity on (the scalar-DAG r4 path was gated to <=4 bodies; this
    algorithm has no such gate)."""

    from ilqr_tpu.models.rbd.dynamics import rnea_derivatives
    import os

    assets = os.path.dirname(TWO_DOF_ARM_URDF)
    cases = [
        (TWO_DOF_ARM_URDF, True),
        (os.path.join(assets, "6Dof_arm.urdf"), False),
        (os.path.join(assets, "6Dof_arm.urdf"), True),
    ]
    key = jax.random.PRNGKey(7)
    for urdf, floating in cases:
        mech = parse_urdf(urdf, floating=floating, gravity=(0.0, 0.0, -9.81))
        kq, kv, ka, key = jax.random.split(key, 4)
        q = jax.random.normal(kq, (mech.nq,), jnp.float64)
        v = jax.random.normal(kv, (mech.nv,), jnp.float64)
        a = jax.random.normal(ka, (mech.nv,), jnp.float64)
        tau, dq, dv = rnea_derivatives(mech, q, v, a)
        np.testing.assert_allclose(
            np.asarray(tau), np.asarray(rnea_inverse_dynamics(mech, q, v, a)),
            rtol=1e-12, atol=1e-12)
        Jq = jax.jacfwd(
            lambda qq: rnea_inverse_dynamics(mech, qq, v, a))(q)
        Jv = jax.jacfwd(
            lambda vv: rnea_inverse_dynamics(mech, q, vv, a))(v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(Jq),
                                   rtol=1e-10, atol=1e-11)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(Jv),
                                   rtol=1e-10, atol=1e-11)


def test_forward_dynamics_derivatives_match_jacfwd():
    """One-sweep forward-dynamics partials (implicit rule against the
    primal Cholesky factor) == jacfwd of forward_dynamics."""

    from ilqr_tpu.models.rbd.dynamics import (
        forward_dynamics,
        forward_dynamics_derivatives,
    )

    mech = _mech()
    key = jax.random.PRNGKey(8)
    kq, kv, kt = jax.random.split(key, 3)
    q = jax.random.normal(kq, (mech.nq,), jnp.float64)
    v = jax.random.normal(kv, (mech.nv,), jnp.float64)
    tau = jax.random.normal(kt, (mech.nv,), jnp.float64)
    vd, dq, dv, Minv = forward_dynamics_derivatives(mech, q, v, tau)
    np.testing.assert_allclose(
        np.asarray(vd), np.asarray(forward_dynamics(mech, q, v, tau)),
        rtol=1e-12, atol=1e-12)
    Jq = jax.jacfwd(lambda qq: forward_dynamics(mech, qq, v, tau))(q)
    Jv = jax.jacfwd(lambda vv: forward_dynamics(mech, q, vv, tau))(v)
    Jt = jax.jacfwd(lambda tt: forward_dynamics(mech, q, v, tt))(tau)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(Jq),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(Jv),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Minv), np.asarray(Jt),
                               rtol=1e-9, atol=1e-11)


def test_explicit_vs_jvp_replay_rk4_jacobians():
    """explicit_derivatives=True (r5 one-sweep) and False (r4 16-tangent
    JVP replay) produce identical RK4 jacobians to rounding."""

    from ilqr_tpu.models.rbd.model import make_rbd_dynamics_jacobians

    mech = _mech()
    for refkin in (False, True):
        jac_new = make_rbd_dynamics_jacobians(
            mech, reference_kinematics=refkin, explicit_derivatives=True)
        jac_old = make_rbd_dynamics_jacobians(
            mech, reference_kinematics=refkin, explicit_derivatives=False)
        x, u = _random_state(jax.random.PRNGKey(11), mech.nv)
        A1, B1 = jac_new(x, u)
        A0, B0 = jac_old(x, u)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                                   rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(B1), np.asarray(B0),
                                   rtol=1e-11, atol=1e-13)
