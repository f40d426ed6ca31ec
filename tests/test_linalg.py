"""Unit tests for the unrolled small-matrix linear algebra."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_tpu.ops.linalg import (
    cholesky_small,
    regularized_pinv,
    solve_general_small,
    solve_psd_small,
)


def random_psd(rng, m, batch=()):
    A = rng.standard_normal(batch + (m, m))
    return A @ np.swapaxes(A, -1, -2) + m * np.eye(m)


@pytest.mark.parametrize("m", [1, 2, 4, 8, 16])
def test_cholesky_matches_numpy(m):
    rng = np.random.default_rng(0)
    A = random_psd(rng, m)
    L = np.asarray(cholesky_small(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("m", [2, 5, 16])
def test_solve_psd_vector_and_matrix_rhs(m):
    rng = np.random.default_rng(1)
    A = random_psd(rng, m)
    b = rng.standard_normal(m)
    B = rng.standard_normal((m, 3))
    x = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(b)))
    X = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-9, atol=1e-9)


def test_batched_and_vmapped():
    rng = np.random.default_rng(2)
    A = random_psd(rng, 4, batch=(7,))
    b = rng.standard_normal((7, 4))
    # Direct batched call (leading dims broadcast elementwise).
    X1 = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(b)))
    # vmapped call.
    X2 = np.asarray(jax.vmap(solve_psd_small)(jnp.asarray(A), jnp.asarray(b)))
    expected = np.stack([np.linalg.solve(A[i], b[i]) for i in range(7)])
    np.testing.assert_allclose(X1, expected, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(X2, expected, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("m", [1, 2, 4, 9])
def test_solve_general_matches_numpy(m):
    rng = np.random.default_rng(7)
    A = rng.standard_normal((m, m))
    b = rng.standard_normal(m)
    B = rng.standard_normal((m, 2 * m + 1))
    x = np.asarray(solve_general_small(jnp.asarray(A), jnp.asarray(b)))
    X = np.asarray(solve_general_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-8, atol=1e-8)


def test_solve_general_needs_pivoting():
    # Zero top-left pivot: unpivoted elimination would divide by zero.
    A = np.array([[0.0, 1.0], [1.0, 1e-3]])
    b = np.array([2.0, 3.0])
    x = np.asarray(solve_general_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-12)


def test_solve_general_batched_and_vmapped():
    rng = np.random.default_rng(8)
    A = rng.standard_normal((6, 4, 4))
    b = rng.standard_normal((6, 4))
    X1 = np.asarray(solve_general_small(jnp.asarray(A), jnp.asarray(b)))
    X2 = np.asarray(jax.vmap(solve_general_small)(jnp.asarray(A),
                                                  jnp.asarray(b)))
    expected = np.stack([np.linalg.solve(A[i], b[i]) for i in range(6)])
    np.testing.assert_allclose(X1, expected, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(X2, expected, rtol=1e-8, atol=1e-8)


def test_regularized_pinv_approximates_inverse():
    rng = np.random.default_rng(3)
    A = random_psd(rng, 4)
    Ainv = np.asarray(regularized_pinv(jnp.asarray(A), reg=1e-12))
    np.testing.assert_allclose(Ainv, np.linalg.inv(A), rtol=1e-6, atol=1e-6)
