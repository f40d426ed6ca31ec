"""Small-matrix products routed to the VPU, not the MXU.

iLQR's per-step matrices are n x n with n ~ 4-20 — under 1% of a 128x128
MXU tile.  ``jnp.matmul``/``einsum`` lower to ``dot_general`` → padded MXU
ops; worse, exact-f32 MXU matmuls (which the Riccati recursion needs — see
``ilqr_tpu.precision``) cost 3-6 bf16 passes.  These helpers express the
same contractions as broadcast-multiply + reduce, which XLA fuses into
plain vector ops: with a scenario batch vmapped in, every scalar of the
n^3 loop is one [batch]-wide VPU instruction at full f32 precision.

Shapes follow jnp conventions with arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def mm(A, B):
    """``A @ B`` for ``A [..., i, k]``, ``B [..., k, j]`` via the VPU."""

    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mtm(A, B):
    """``A.T @ B`` for ``A [..., k, i]``, ``B [..., k, j]``."""

    return jnp.sum(A[..., :, :, None] * B[..., :, None, :], axis=-3)


def mmt(A, B):
    """``A @ B.T`` for ``A [..., i, k]``, ``B [..., j, k]``."""

    return jnp.sum(A[..., :, None, :] * B[..., None, :, :], axis=-1)


def mv(A, x):
    """``A @ x`` for ``A [..., i, k]``, ``x [..., k]``."""

    return jnp.sum(A * x[..., None, :], axis=-1)


def mtv(A, x):
    """``A.T @ x`` for ``A [..., k, i]``, ``x [..., k]``."""

    return jnp.sum(A * x[..., :, None], axis=-2)


def vv(x, y):
    """Dot product over the last axis."""

    return jnp.sum(x * y, axis=-1)


# ---------------------------------------------------------------------------
# Batch-last ("_bl") variants: matrix dims lead, the scenario batch is the
# trailing axis.  This is the production layout on TPU — the minor (lane)
# dimension is the large batch, so every materialized array tiles perfectly,
# where a [..., n, n]-minor layout pads 4x4 blocks into (8, 128) tiles (64x
# memory/bandwidth waste).
# ---------------------------------------------------------------------------

def mm_bl(A, B):
    """``A @ B`` with ``A [i, k, B]``, ``B [k, j, B]`` → ``[i, j, B]``."""

    return jnp.sum(A[:, :, None, :] * B[None, :, :, :], axis=1)


def mtm_bl(A, B):
    """``A.T @ B`` with ``A [k, i, B]``, ``B [k, j, B]`` → ``[i, j, B]``."""

    return jnp.sum(A[:, :, None, :] * B[:, None, :, :], axis=0)


def mv_bl(A, x):
    """``A @ x`` with ``A [i, k, B]``, ``x [k, B]`` → ``[i, B]``."""

    return jnp.sum(A * x[None, :, :], axis=1)


def mtv_bl(A, x):
    """``A.T @ x`` with ``A [k, i, B]``, ``x [k, B]`` → ``[i, B]``."""

    return jnp.sum(A * x[:, None, :], axis=0)


def vv_bl(x, y):
    """Dot over the leading axis: ``x [k, B]``, ``y [k, B]`` → ``[B]``."""

    return jnp.sum(x * y, axis=0)


def transpose_bl(A):
    """``A.T`` for ``A [i, j, B]``."""

    return jnp.swapaxes(A, 0, 1)


def cholesky_bl(A, reg=0.0):
    """Lower Cholesky of ``A + reg I`` for ``A [m, m, B]`` (unrolled)."""

    m = A.shape[0]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        s = A[j, j, :] + reg
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, m):
            s = A[i, j, :]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(A[0, 0, :])
    return jnp.stack([
        jnp.stack([L[i][j] if j <= i else zero for j in range(m)], axis=0)
        for i in range(m)
    ], axis=0)


def cho_solve_bl(L, b):
    """Solve ``(L L^T) x = b`` with ``L [m, m, B]``; ``b [m, B]`` or
    ``[m, k, B]``."""

    m = L.shape[0]
    matrix_rhs = b.ndim == 3
    ys = []
    for i in range(m):
        s = b[i]
        for j in range(i):
            s = s - (L[i, j][None, :] * ys[j] if matrix_rhs else L[i, j] * ys[j])
        ys.append(s / (L[i, i][None, :] if matrix_rhs else L[i, i]))
    xs = [None] * m
    for i in reversed(range(m)):
        s = ys[i]
        for j in range(i + 1, m):
            s = s - (L[j, i][None, :] * xs[j] if matrix_rhs else L[j, i] * xs[j])
        xs[i] = s / (L[i, i][None, :] if matrix_rhs else L[i, i])
    return jnp.stack(xs, axis=0)


def solve_psd_bl(A, b, reg=0.0):
    """Solve ``(A + reg I) x = b`` for SPD ``A [m, m, B]``."""

    return cho_solve_bl(cholesky_bl(A, reg), b)
