"""Diagnose RBD convergence: iterations-to-converge in f64 vs f32 (CPU)."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import sys
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np
import time

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.models.rbd.model import make_rbd_arm_problem
from ilqr_tpu.utils.metrics import solve_with_trace
from ilqr_tpu.problem import rollout

problem = make_rbd_arm_problem()
T = int(sys.argv[1]) if len(sys.argv) > 1 else 100
max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 150

for dtype in (jnp.float64, jnp.float32):
    config = ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                        tol_grad_rel=1e-6, scan_unroll=1)
    key = jax.random.PRNGKey(0)
    x0 = (jnp.zeros(16) + 0.05 * jax.random.normal(key, (16,))).astype(dtype)
    us0 = jnp.zeros((T, 8), dtype)
    xs0 = rollout(problem.dynamics, x0, us0).astype(dtype)

    t0 = time.time()
    result, trace = jax.jit(
        lambda a, b: solve_with_trace(problem, a, b, config=config)
    )(xs0, us0)
    jax.block_until_ready(result.us)
    print(f"\n=== dtype={dtype.__name__} T={T} compile+run={time.time()-t0:.1f}s")
    print(f"status={int(result.status)} ({Status(int(result.status)).name}) "
          f"iters={int(result.iterations)} cost={float(result.cost):.6e} "
          f"du_sq={float(result.du_sq):.3e}")
    valid = np.asarray(trace.valid)
    cost = np.asarray(trace.cost)[valid]
    dv1 = np.asarray(trace.dV1)[valid]
    alpha = np.asarray(trace.alpha)[valid]
    bts = np.asarray(trace.backtracks)[valid]
    for i in range(len(cost)):
        if i < 10 or i % 10 == 0 or i >= len(cost) - 3:
            print(f"  it={i:3d} cost={cost[i]:.8e} dV1={dv1[i]:+.3e} "
                  f"rel={abs(dv1[i])/max(cost[i],1e-30):.2e} "
                  f"alpha={alpha[i]:.4f} bts={bts[i]}")
