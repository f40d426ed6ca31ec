"""Full-DDP extension: second-order dynamics terms in the backward pass.

The reference is pure iLQR — its backward pass stops at the dynamics
Jacobian (src/backward_pass.jl:25-40) — so everything here is framework
extension territory (``ILQRConfig(ddp=True)``), default-off for parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.backward import backward_pass, riccati_scan
from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.derivatives import dynamics_hessians, linearize_dynamics
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve


def test_hessian_tensor_matches_jacobian_of_jacobian():
    """Fzz[t, k, i, j] must equal d(A|B)[k, i]/dz_j."""

    problem = make_two_link_problem()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(0.3 * rng.standard_normal((5, 4)))
    us = jnp.asarray(0.3 * rng.standard_normal((4, 2)))

    Fzz = dynamics_hessians(problem.dynamics, xs[:-1], us)
    assert Fzz.shape == (4, 4, 6, 6)

    n = 4

    def jac_z(z):
        f = lambda zz: problem.dynamics(zz[:n], zz[n:])
        return jax.jacfwd(f)(z)

    for t in range(4):
        z = jnp.concatenate([xs[t], us[t]])
        expected = jax.jacfwd(jac_z)(z)  # [n, n+m, n+m]
        np.testing.assert_allclose(np.asarray(Fzz[t]), np.asarray(expected),
                                   rtol=1e-9, atol=1e-11)
    # Mixed-partial symmetry of the returned tensor.
    np.testing.assert_allclose(np.asarray(Fzz),
                               np.asarray(jnp.swapaxes(Fzz, -1, -2)),
                               rtol=0, atol=1e-11)


def test_ddp_reduces_to_ilqr_for_linear_dynamics():
    """Fzz == 0 for linear dynamics, so the DDP recursion must reproduce
    the plain scan bit-for-bit."""

    rng = np.random.default_rng(1)
    n, m, T = 3, 2, 16
    A = jnp.asarray(rng.standard_normal((n, n)) * 0.3 + np.eye(n))
    B = jnp.asarray(rng.standard_normal((n, m)) * 0.1)

    As = jnp.broadcast_to(A, (T, n, n))
    Bs = jnp.broadcast_to(B, (T, n, m))
    q = jnp.zeros(T)
    qx = jnp.asarray(rng.standard_normal((T, n)) * 0.1)
    ru = jnp.asarray(rng.standard_normal((T, m)) * 0.1)
    Qxx = jnp.broadcast_to(jnp.eye(n), (T, n, n))
    Pux = jnp.zeros((T, m, n))
    Ruu = jnp.broadcast_to(0.1 * jnp.eye(m), (T, m, m))
    qN, qxN, QN = jnp.zeros(()), jnp.zeros(n), 10.0 * jnp.eye(n)
    Fzz = jnp.zeros((T, n, n + m, n + m))

    plain = riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                         reg=1e-2)
    ddp = riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                       reg=1e-2, Fzz=Fzz)
    np.testing.assert_array_equal(np.asarray(plain.Ks), np.asarray(ddp.Ks))
    np.testing.assert_array_equal(np.asarray(plain.duffs),
                                  np.asarray(ddp.duffs))


def test_ddp_backward_pass_differs_on_nonlinear_dynamics():
    """On the 2-link arm the curvature terms are nonzero — the DDP gains
    must actually differ from iLQR's (the flag does something)."""

    problem = make_two_link_problem()
    rng = np.random.default_rng(2)
    T = 32
    x0 = jnp.asarray([0.3, -0.2, 0.0, 0.0])
    us = jnp.asarray(0.3 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)

    ilqr = backward_pass(problem, xs, us, ILQRConfig())
    ddp = backward_pass(problem, xs, us, ILQRConfig(ddp=True))
    assert not np.allclose(np.asarray(ilqr.Ks), np.asarray(ddp.Ks),
                           rtol=1e-6, atol=1e-8)


def test_ddp_converges_on_two_link_swingup():
    """Full solve with ddp=True reaches the reference convergence criterion
    and a final cost at least as good as plain iLQR's."""

    problem = make_two_link_problem()
    T = 100
    x0 = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    us0 = jnp.zeros((T, 2))
    xs0 = rollout(problem.dynamics, x0, us0)

    cfg = ILQRConfig(max_iter=100, tol=1e-8)
    res_ilqr = solve(problem, xs0, us0, config=cfg)
    res_ddp = solve(problem, xs0, us0, config=cfg.replace(ddp=True))

    assert int(res_ddp.status) == int(Status.CONVERGED)
    c_ddp = float(res_ddp.cost)
    c_ilqr = float(res_ilqr.cost)
    assert c_ddp <= c_ilqr * (1 + 1e-6)


def test_ddp_rejects_parallel_backends():
    with pytest.raises(ValueError):
        ILQRConfig(ddp=True, backward_backend="associative")
    with pytest.raises(ValueError):
        ILQRConfig(ddp=True, backward_backend="pallas")


@pytest.mark.slow
def test_rbd_dynamics_second_order_ad():
    """fwd-over-fwd traces through the RBD custom-JVP dynamics — the DDP
    tensor exists and is finite/symmetric for the floating-base arm
    (compile-heavy: ~1 min on CPU, hence slow-marked; feasibility also
    recorded in BENCH.md round 5)."""

    from ilqr_tpu.models.rbd import make_rbd_arm_problem

    problem = make_rbd_arm_problem()
    n, m = problem.state_dim, problem.control_dim
    Fzz = dynamics_hessians(problem.dynamics, jnp.zeros((1, n)),
                            jnp.zeros((1, m)))
    assert Fzz.shape == (1, n, n + m, n + m)
    assert bool(jnp.all(jnp.isfinite(Fzz)))
    np.testing.assert_allclose(np.asarray(Fzz),
                               np.asarray(jnp.swapaxes(Fzz, -1, -2)),
                               rtol=0, atol=1e-10)
