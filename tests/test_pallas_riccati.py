"""Pallas backward-Riccati kernel vs the lax.scan reference (interpret mode
on CPU; the same kernel compiles with Mosaic on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.backward import backward_pass, riccati_scan
from ilqr_tpu.config import ILQRConfig
from ilqr_tpu.derivatives import (
    linearize_dynamics,
    quadratize_final_cost,
    quadratize_running_cost,
)
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_batched
from ilqr_tpu.problem import rollout


def _batched_models(problem, B, T, seed=0):
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(0.2 * rng.standard_normal((B, 4)))
    uss = jnp.asarray(0.2 * rng.standard_normal((B, T, 2)))
    xss = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(x0s, uss)

    def models(xs, us):
        As, Bs = linearize_dynamics(problem.dynamics, xs[:-1], us)
        q, qx, ru, Qxx, Pux, Ruu = quadratize_running_cost(
            problem.cost, xs[:-1], us)
        qN, qxN, QN = quadratize_final_cost(problem.final_cost, xs[-1])
        return As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN

    return jax.vmap(models)(xss, uss)


@pytest.mark.parametrize("B", [3, 128])
def test_pallas_kernel_matches_scan(B):
    problem = make_two_link_problem()
    T = 24
    As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN = _batched_models(
        problem, B, T)

    seq = jax.vmap(
        lambda *a: riccati_scan(*a, reg=0.01, symmetrize=True)
    )(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN)

    duffs, Ks, dv1, dv2 = riccati_scan_pallas_batched(
        As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN,
        reg=0.01, symmetrize=True, interpret=True)

    np.testing.assert_allclose(np.asarray(duffs), np.asarray(seq.duffs),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(seq.Ks),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(seq.dV1),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(seq.dV2),
                               rtol=1e-9)


def test_pallas_backend_through_vmapped_backward_pass(monkeypatch):
    """config.backward_backend="pallas": unbatched calls use the scan;
    vmapped calls dispatch to the kernel via custom_vmap."""

    monkeypatch.setenv("ILQR_TPU_PALLAS_INTERPRET", "1")
    problem = make_two_link_problem()
    T, B = 16, 5
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, 4)))
    uss = jnp.asarray(0.1 * rng.standard_normal((B, T, 2)))
    xss = jax.vmap(lambda x0, us: rollout(problem.dynamics, x0, us))(x0s, uss)

    cfg_scan = ILQRConfig()
    cfg_pallas = ILQRConfig(backward_backend="pallas")

    ref = jax.vmap(lambda xs, us: backward_pass(problem, xs, us, cfg_scan))(
        xss, uss)
    out = jax.vmap(lambda xs, us: backward_pass(problem, xs, us, cfg_pallas))(
        xss, uss)
    np.testing.assert_allclose(np.asarray(out.duffs), np.asarray(ref.duffs),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.Ks), np.asarray(ref.Ks),
                               rtol=1e-10, atol=1e-12)

    # Unbatched path also agrees.
    one = backward_pass(problem, xss[0], uss[0], cfg_pallas)
    np.testing.assert_allclose(np.asarray(one.duffs), np.asarray(ref.duffs[0]),
                               rtol=1e-10, atol=1e-12)


def test_pallas_backend_full_solve(monkeypatch):
    """Full solve with the pallas backend matches the scan backend."""

    from ilqr_tpu.parallel.batching import batch_solve

    monkeypatch.setenv("ILQR_TPU_PALLAS_INTERPRET", "1")
    problem = make_two_link_problem()
    T, B = 12, 4
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, 4)))
    us0 = jnp.zeros((B, T, 2))

    ref = batch_solve(problem, x0s, us0, config=ILQRConfig(max_iter=20))
    out = batch_solve(problem, x0s, us0,
                      config=ILQRConfig(max_iter=20,
                                        backward_backend="pallas"))
    np.testing.assert_allclose(np.asarray(out.us), np.asarray(ref.us),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(out.status),
                                  np.asarray(ref.status))


def test_pallas_time_blocked_matches_scan():
    """The multi-timestep grid-block path (time_block > 1, the production
    Mosaic configuration at large B) produces the same recursion as
    time_block=1 — verified on tiny shapes where interpret mode can unroll
    the blocked kernel body quickly."""

    from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_batched

    problem = make_two_link_problem()
    B, T = 3, 8
    As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN = _batched_models(
        problem, B, T)

    seq = jax.vmap(
        lambda *a: riccati_scan(*a, reg=0.01, symmetrize=True)
    )(As, Bs, q, qx, ru, Qxx, Pux, Ruu, qN, qxN, QN)

    duffs, Ks, dv1, dv2 = riccati_scan_pallas_batched(
        As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN,
        reg=0.01, symmetrize=True, interpret=True, time_block=4)

    np.testing.assert_allclose(np.asarray(duffs), np.asarray(seq.duffs),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ks), np.asarray(seq.Ks),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(seq.dV1),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(dv2), np.asarray(seq.dV2),
                               rtol=1e-9)
