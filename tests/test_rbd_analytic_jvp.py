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
