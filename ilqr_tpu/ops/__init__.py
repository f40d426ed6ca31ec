"""TPU-native compute kernels and small-matrix linear algebra."""

from ilqr_tpu.ops.linalg import (
    cholesky_small,
    solve_tri_lower,
    solve_tri_upper,
    solve_psd_small,
    regularized_pinv,
)

__all__ = [
    "cholesky_small",
    "solve_tri_lower",
    "solve_tri_upper",
    "solve_psd_small",
    "regularized_pinv",
]
