"""Parallel-in-time (associative-scan) Riccati vs the sequential scan."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_tpu.backward import backward_pass, riccati_scan
from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.derivatives import (
    linearize_dynamics,
    quadratize_final_cost,
    quadratize_running_cost,
)
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.pit import riccati_associative_scan, value_functions_associative
from ilqr_tpu.problem import rollout


def _local_models(problem, xs, us):
    As, Bs = linearize_dynamics(problem.dynamics, xs[:-1], us)
    q, qx, ru, Qxx, Pux, Ruu = quadratize_running_cost(problem.cost, xs[:-1], us)
    qN, qxN, QN = quadratize_final_cost(problem.final_cost, xs[-1])
    return As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN


def test_associative_matches_sequential_unregularized():
    problem = make_two_link_problem()
    rng = np.random.default_rng(0)
    T = 64
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(0.2 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)
    models = _local_models(problem, xs, us)

    seq = riccati_scan(*models, reg=0.0)
    par = riccati_associative_scan(*models, reg=0.0)

    np.testing.assert_allclose(np.asarray(par.duffs), np.asarray(seq.duffs),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.Ks), np.asarray(seq.Ks),
                               rtol=1e-7, atol=1e-9)


def test_associative_value_functions_match_sequential():
    """Check S_k itself via the sequential recursion re-run in numpy."""

    problem = make_two_link_problem()
    rng = np.random.default_rng(1)
    T = 16
    x0 = jnp.asarray([0.2, 0.1, 0.0, 0.0])
    us = jnp.asarray(0.2 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)
    As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN = map(
        np.asarray, _local_models(problem, xs, us))

    S_par, s_par = value_functions_associative(
        *map(jnp.asarray, (As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN)))

    # Exact (unregularized) sequential Riccati in numpy.
    S = QN.copy(); s = qxN.copy()
    S_seq = [S]; s_seq = [s]
    for t in range(T - 1, -1, -1):
        A, B = As[t], Bs[t]
        g = ru[t] + B.T @ s
        G = Pux[t] + B.T @ S @ A
        H = Ruu[t] + B.T @ S @ B
        K = -np.linalg.solve(H, G)
        duff = -np.linalg.solve(H, g)
        s_new = qx[t] + A.T @ s + K.T @ H @ duff + K.T @ g + G.T @ duff
        S_new = Qxx[t] + A.T @ S @ A + K.T @ H @ K + K.T @ G + G.T @ K
        S, s = S_new, s_new
        S_seq.insert(0, S); s_seq.insert(0, s)

    np.testing.assert_allclose(np.asarray(S_par), np.stack(S_seq),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_par), np.stack(s_seq),
                               rtol=1e-8, atol=1e-10)


def test_associative_backend_through_solver_config():
    problem = make_two_link_problem()
    rng = np.random.default_rng(2)
    T = 32
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(0.1 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)

    seq = backward_pass(problem, xs, us, ILQRConfig(reg=0.0))
    par = backward_pass(problem, xs, us,
                        ILQRConfig(reg=0.0, backward_backend="associative"))
    np.testing.assert_allclose(np.asarray(par.Ks), np.asarray(seq.Ks),
                               rtol=1e-7, atol=1e-9)


def test_reg_in_value_exact_agreement_at_nonzero_reg():
    """With consistent trust-region semantics (reg_in_value=True) the
    sequential and associative backends agree to roundoff at reg > 0 —
    the O(reg) caveat is a property of the reference's mixed recursion,
    not of parallel-in-time Riccati itself."""

    problem = make_two_link_problem()
    rng = np.random.default_rng(3)
    T = 64
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(0.2 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)
    models = _local_models(problem, xs, us)

    for reg in (1e-2, 1.0):
        seq = riccati_scan(*models, reg=reg, reg_in_value=True)
        par = riccati_associative_scan(*models, reg=reg, reg_in_value=True)
        np.testing.assert_allclose(np.asarray(par.duffs),
                                   np.asarray(seq.duffs),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(par.Ks), np.asarray(seq.Ks),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(float(par.dV1), float(seq.dV1),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(float(par.dV2), float(seq.dV2),
                                   rtol=1e-7, atol=1e-10)

        # ... and the mixed (reference) semantics at the same reg really is
        # a different recursion — the gap the flag closes.
        seq_mixed = riccati_scan(*models, reg=reg, reg_in_value=False)
        assert not np.allclose(np.asarray(seq_mixed.Ks), np.asarray(seq.Ks),
                               rtol=1e-7, atol=1e-9)


def test_reg_in_value_equals_cost_augmentation():
    """reg_in_value=True == solving the unregularized problem whose stage
    cost has reg/2 |du|^2 added (Ruu -> Ruu + reg I, ru unchanged)."""

    problem = make_two_link_problem()
    rng = np.random.default_rng(4)
    T = 32
    x0 = jnp.asarray([0.2, 0.1, 0.0, 0.0])
    us = jnp.asarray(0.1 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)
    As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN = _local_models(
        problem, xs, us)

    reg = 0.05
    a = riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN,
                     reg=reg, reg_in_value=True)
    Ruu_aug = Ruu + reg * jnp.eye(Ruu.shape[-1], dtype=Ruu.dtype)
    b = riccati_scan(As, Bs, q, qx, ru, Qxx, Pux, Ruu_aug, qN, qxN, QN,
                     reg=0.0, reg_in_value=False)
    np.testing.assert_allclose(np.asarray(a.Ks), np.asarray(b.Ks),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.duffs), np.asarray(b.duffs),
                               rtol=1e-9, atol=1e-12)


def test_reg_in_value_through_solver_config():
    """End-to-end: both backends under ILQRConfig(reg_in_value=True) with
    the default reg=1e-2 produce the same gains, with no O(reg) warning."""

    import warnings as _warnings

    problem = make_two_link_problem()
    rng = np.random.default_rng(5)
    T = 32
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0])
    us = jnp.asarray(0.1 * rng.standard_normal((T, 2)))
    xs = rollout(problem.dynamics, x0, us)

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")  # the O(reg) warning must NOT fire
        cfg_par = ILQRConfig(reg_in_value=True,
                             backward_backend="associative")
    seq = backward_pass(problem, xs, us, ILQRConfig(reg_in_value=True))
    par = backward_pass(problem, xs, us, cfg_par)
    np.testing.assert_allclose(np.asarray(par.Ks), np.asarray(seq.Ks),
                               rtol=1e-7, atol=1e-9)
