"""RBD at the reference's own scale: T=1000, reference initial state."""
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
T = 1000
max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
dtype = jnp.float32
target = np.array([0.0, 0.0, 0.0, 5.0, 1.0, 2.0, 1.0, 0.3])

config = ILQRConfig(max_iter=max_iter, tol=1e-5, tol_grad=1e-10,
                    tol_grad_rel=1e-6, scan_unroll=1,
                    adaptive_reg=True, reg=1.0, reg_min=1e-3,
                    reg_scale=10.0, reg_backtrack_trigger=1)

# Reference initial configuration (RBD_helper_functions.jl:9):
# quat [0,0,0,1] -> MRP [0,0,1]; r=[.5,.75,1.]; joints [0,0]; zero velocity.
x0 = jnp.asarray([0.0, 0.0, 1.0, 0.5, 0.75, 1.0, 0.0, 0.0] + [0.0] * 8, dtype)
us0 = jnp.zeros((T, 8), dtype)
xs0 = rollout(problem.dynamics, x0, us0).astype(dtype)

t0 = time.time()
result, trace = jax.jit(
    lambda a, b: solve_with_trace(problem, a, b, config=config)
)(xs0, us0)
jax.block_until_ready(result.us)
print(f"=== T={T} f32 tassa_s10 ({time.time()-t0:.0f}s) status="
      f"{Status(int(result.status)).name} iters={int(result.iterations)} "
      f"cost={float(result.cost):.6e} du_sq={float(result.du_sq):.3e}",
      flush=True)
xN = np.asarray(result.xs[-1])
print("terminal pose err:", xN[:8] - target)
valid = np.asarray(trace.valid)
cost = np.asarray(trace.cost)[valid]
dv1 = np.asarray(trace.dV1)[valid]
alpha = np.asarray(trace.alpha)[valid]
bts = np.asarray(trace.backtracks)[valid]
reg = np.asarray(trace.reg)[valid]
for i in range(len(cost)):
    if i % 5 == 0 or i >= len(cost) - 2:
        print(f"  it={i:3d} cost={cost[i]:.6e} rel={abs(dv1[i])/max(cost[i],1e-30):.2e} "
              f"alpha={alpha[i]:.4f} bts={bts[i]} reg={reg[i]:.2e}", flush=True)
