"""f32-vs-f64 drift at long horizon (ROADMAP item: numerics parity).

The Julia reference is Float64 end-to-end; the TPU production path is f32
(with matmul precision pinned to full f32, see ilqr_tpu/precision.py).
This test quantifies the drift that dtype choice introduces on the
long-horizon 2-link swing-up (the reference's N=900 example shape,
test/2_link_example/animate_2_link.jl:9) so regressions in f32 numerical
hygiene (lost symmetrization, bf16 matmuls sneaking in) show up as test
failures rather than silent solution-quality loss.
"""

import jax.numpy as jnp
import numpy as np

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.two_link import make_two_link_problem
from ilqr_tpu.problem import rollout
from ilqr_tpu.solver import solve

T = 900
N_ITER = 10


def _solve(dtype):
    problem = make_two_link_problem()
    x0 = jnp.asarray([0.1, -0.1, 0.0, 0.0], dtype)
    us0 = jnp.zeros((T, 2), dtype)
    xs0 = rollout(problem.dynamics, x0, us0)
    config = ILQRConfig(max_iter=N_ITER, tol=0.0, tol_grad_rel=0.0)
    return solve(problem, xs0, us0, config=config)


def test_f32_tracks_f64_at_long_horizon():
    r64 = _solve(jnp.float64)
    r32 = _solve(jnp.float32)

    assert r64.xs.dtype == jnp.float64
    assert r32.xs.dtype == jnp.float32

    # Both make real progress and neither NaNs out.  (The f32 lane may stop
    # early at its cost-resolution floor — with tol_grad_rel disabled that
    # reports LINESEARCH_FAILED, which is fine here as long as the cost
    # itself tracks f64; see BENCH.md on the f32 floor.)
    assert np.isfinite(float(r32.cost)) and np.isfinite(float(r64.cost))
    assert int(r64.status) in (int(Status.CONVERGED), int(Status.MAX_ITER))

    # Identical iteration-by-iteration algorithm: the f32 cost must track
    # the f64 cost to f32 resolution at this depth (N=900 RK4 rollout plus
    # 10 Riccati sweeps).  The bound is loose against legitimate rounding
    # but catches catastrophic drift (bf16 matmuls, lost symmetrization).
    c64, c32 = float(r64.cost), float(r32.cost)
    assert abs(c32 - c64) / abs(c64) < 5e-3, (c32, c64)

    # Control-trajectory drift stays inside the 1e-3-scale parity budget
    # relative to the control magnitude.
    u64 = np.asarray(r64.us)
    u32 = np.asarray(r32.us, np.float64)
    scale = max(1.0, np.max(np.abs(u64)))
    assert np.max(np.abs(u32 - u64)) / scale < 2e-2
