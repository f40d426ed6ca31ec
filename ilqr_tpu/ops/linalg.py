"""Small-matrix linear algebra, unrolled for the TPU vector unit.

iLQR state/control dims are tiny (n, m <= ~20) — orders of magnitude below
the 128x128 MXU tile.  Library factorizations (`jnp.linalg.solve` → LU with
pivoting) lower to serial loops that waste the hardware.  Instead, every
factorization here is *unrolled at trace time* over the static matrix
dimension, so each scalar of the recurrence is an elementwise op over
whatever batch dimensions are present — under ``vmap`` a batch of 4096
scenarios turns each of the ~m^3/3 Cholesky steps into one [4096]-wide VPU
instruction.

This replaces the reference's LAPACK ``\\`` solve of the regularized Quu
(src/backward_pass.jl:214-216).  The dead SVD fallback
(``regularized_persudo_inverse``, src/backward_pass.jl:221-233) is provided
as :func:`regularized_pinv` for API parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(A):
    """Lower-Cholesky factor of a PSD matrix ``A [..., m, m]``, unrolled.

    Cholesky–Crout with the m-loop unrolled at trace time; all arithmetic is
    batched elementwise over leading dims.  ``m`` must be a static (Python)
    dimension.
    """

    m = A.shape[-1]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_diag = 1.0 / L[j][j]
        for i in range(j + 1, m):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(m)], axis=-1)
        for i in range(m)
    ]
    return jnp.stack(rows, axis=-2)


def solve_tri_lower(L, b):
    """Solve ``L y = b`` with ``L [..., m, m]`` lower triangular, unrolled.

    ``b`` may be ``[..., m]`` or ``[..., m, k]``.
    """

    m = L.shape[-1]
    matrix_rhs = b.ndim == L.ndim
    ys = []
    for i in range(m):
        s = b[..., i, :] if matrix_rhs else b[..., i]
        for j in range(i):
            lij = L[..., i, j]
            s = s - (lij[..., None] * ys[j] if matrix_rhs else lij * ys[j])
        lii = L[..., i, i]
        ys.append(s / (lii[..., None] if matrix_rhs else lii))
    return jnp.stack(ys, axis=-2 if matrix_rhs else -1)


def solve_tri_upper(U, b):
    """Solve ``U y = b`` with ``U [..., m, m]`` upper triangular, unrolled."""

    m = U.shape[-1]
    matrix_rhs = b.ndim == U.ndim
    ys = [None] * m
    for i in reversed(range(m)):
        s = b[..., i, :] if matrix_rhs else b[..., i]
        for j in range(i + 1, m):
            uij = U[..., i, j]
            s = s - (uij[..., None] * ys[j] if matrix_rhs else uij * ys[j])
        uii = U[..., i, i]
        ys[i] = s / (uii[..., None] if matrix_rhs else uii)
    return jnp.stack(ys, axis=-2 if matrix_rhs else -1)


def solve_psd_small(A, b):
    """Solve ``A x = b`` for symmetric positive-definite ``A [..., m, m]``.

    Unrolled Cholesky + two triangular substitutions; ``b`` may be a vector
    ``[..., m]`` or matrix ``[..., m, k]`` right-hand side.
    """

    L = cholesky_small(A)
    y = solve_tri_lower(L, b)
    LT = jnp.swapaxes(L, -1, -2)
    return solve_tri_upper(LT, y)


def solve_general_small(A, b):
    """Solve ``A x = b`` for a general (non-symmetric) ``A [..., m, m]``,
    unrolled Gaussian elimination with partial pivoting.

    Like :func:`solve_psd_small`, the m-loop is unrolled at trace time so
    every scalar recurrence step is one batched VPU op over the leading
    dims; the pivot choice is data-dependent per batch element and realized
    with ``where``-selects instead of row gathers (no dynamic indexing, so
    the whole solve stays fusable).  ``b`` may be ``[..., m]`` or
    ``[..., m, k]``.

    This is the TPU replacement for ``jnp.linalg.solve`` (batched LAPACK
    LU) on the tiny matrices of the parallel-in-time Riccati combine
    (ilqr_tpu/pit.py), where the library path lowers to serial loops.
    """

    m = A.shape[-1]
    vector_rhs = b.ndim == A.ndim - 1
    if vector_rhs:
        b = b[..., None]
    # Augmented rows [..., m + k] held as a Python list so all indexing is
    # static; pivoting permutes list entries per batch lane via selects.
    rows = [jnp.concatenate([A[..., i, :], b[..., i, :]], axis=-1)
            for i in range(m)]

    for kcol in range(m):
        # Partial pivot: among rows kcol..m-1 pick the largest |A[:, kcol]|.
        if kcol < m - 1:
            mags = jnp.stack([jnp.abs(rows[i][..., kcol])
                              for i in range(kcol, m)], axis=-1)
            p_rel = jnp.argmax(mags, axis=-1)  # [...], 0 => no swap
            pivot_row = rows[kcol]
            for off in range(1, m - kcol):
                sel = (p_rel == off)[..., None]
                pivot_row = jnp.where(sel, rows[kcol + off], pivot_row)
            for off in range(1, m - kcol):
                sel = (p_rel == off)[..., None]
                rows[kcol + off] = jnp.where(sel, rows[kcol],
                                             rows[kcol + off])
            rows[kcol] = pivot_row
        inv_piv = 1.0 / rows[kcol][..., kcol]
        for i in range(kcol + 1, m):
            factor = rows[i][..., kcol] * inv_piv
            rows[i] = rows[i] - factor[..., None] * rows[kcol]

    # Back substitution on the augmented tail.
    xs = [None] * m
    for i in reversed(range(m)):
        s = rows[i][..., m:]
        for j in range(i + 1, m):
            s = s - rows[i][..., j, None] * xs[j]
        xs[i] = s / rows[i][..., i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vector_rhs else x


def regularized_pinv(A, reg: float = 1e-5):
    """SVD pseudo-inverse with Tikhonov-regularized singular values.

    Functional equivalent of the reference's (dead) fallback path
    ``regularized_persudo_inverse`` (src/backward_pass.jl:221-233): negative
    singular values are clamped to zero (SVD never produces them, kept for
    behavioral parity), ``reg`` is added before inversion, and
    ``V diag(1/(s+reg)) U^T`` is returned.  SVD is slow on TPU — prefer
    :func:`solve_psd_small`; this exists for conditioning emergencies and
    API completeness.
    """

    U, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    s = jnp.maximum(s, 0.0)
    s_inv = 1.0 / (s + reg)
    return jnp.swapaxes(Vt, -1, -2) @ (s_inv[..., None] * jnp.swapaxes(U, -1, -2))
