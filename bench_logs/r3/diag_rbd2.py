"""RBD reg-schedule experiments (CPU, f32)."""
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
T = 100
max_iter = 150
dtype = jnp.float32

variants = {
    "tassa_s10": ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                            tol_grad_rel=1e-6, scan_unroll=1,
                            adaptive_reg=True, reg=1.0, reg_min=1e-3,
                            reg_scale=10.0, reg_backtrack_trigger=1),
    "tassa_s4": ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                           tol_grad_rel=1e-6, scan_unroll=1,
                           adaptive_reg=True, reg=1.0, reg_min=1e-3,
                           reg_scale=4.0, reg_backtrack_trigger=1),
    "tassa_trig2": ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                              tol_grad_rel=1e-6, scan_unroll=1,
                              adaptive_reg=True, reg=1.0, reg_min=1e-3,
                              reg_scale=10.0, reg_backtrack_trigger=2),
    "highreg_1e4": ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                              tol_grad_rel=1e-6, scan_unroll=1, reg=1e4),
}

key = jax.random.PRNGKey(0)
x0 = (jnp.zeros(16) + 0.05 * jax.random.normal(key, (16,))).astype(dtype)
us0 = jnp.zeros((T, 8), dtype)

for name, config in variants.items():
    xs0 = rollout(problem.dynamics, x0, us0).astype(dtype)
    t0 = time.time()
    result, trace = jax.jit(
        lambda a, b, c=config: solve_with_trace(problem, a, b, config=c)
    )(xs0, us0)
    jax.block_until_ready(result.us)
    print(f"\n=== {name} ({time.time()-t0:.0f}s) status="
          f"{Status(int(result.status)).name} iters={int(result.iterations)} "
          f"cost={float(result.cost):.6e} du_sq={float(result.du_sq):.3e}")
    valid = np.asarray(trace.valid)
    cost = np.asarray(trace.cost)[valid]
    dv1 = np.asarray(trace.dV1)[valid]
    alpha = np.asarray(trace.alpha)[valid]
    bts = np.asarray(trace.backtracks)[valid]
    reg = np.asarray(trace.reg)[valid]
    for i in range(len(cost)):
        if i % 10 == 0 or i >= len(cost) - 2:
            print(f"  it={i:3d} cost={cost[i]:.6e} rel={abs(dv1[i])/max(cost[i],1e-30):.2e} "
                  f"alpha={alpha[i]:.4f} bts={bts[i]} reg={reg[i]:.2e}")
