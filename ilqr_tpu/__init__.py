"""ilqr_tpu — a TPU-native iLQR/DDP trajectory-optimization framework in JAX.

A from-scratch re-design of the capability surface of ``aabouman/iLQR.jl``
(reference at ``/root/reference``) for TPU hardware:

* the user contract is three pure JAX callables —
  ``dynamics(x, u) -> x_next``, ``cost(x, u) -> scalar``,
  ``final_cost(x) -> scalar`` (reference: src/forward_pass.jl:113-144);
* all whole-horizon derivative work is one ``vmap`` sweep
  (reference recomputes per step: src/backward_pass.jl:339-351);
* the backward Riccati recursion is a ``lax.scan(reverse=True)`` over pure
  matmul steps (reference: src/backward_pass.jl:324-357);
* the forward rollout + backtracking line search is a bounded
  ``lax.while_loop`` around a ``lax.scan`` rollout
  (reference: src/forward_pass.jl:55-93, which loops unboundedly);
* everything jits, vmaps (batched scenario solving) and shards
  (``shard_map`` over a scenario mesh axis) with no further work.
"""

from ilqr_tpu.config import ILQRConfig, Status
from ilqr_tpu.problem import Problem, rollout, total_cost
from ilqr_tpu.derivatives import (linearize_dynamics, quadratize_running_cost,
                                  quadratize_final_cost, dynamics_hessians)
from ilqr_tpu.backward import backward_pass
from ilqr_tpu.forward import forward_pass
from ilqr_tpu.solver import solve, fit, SolverResult, make_solver

__version__ = "0.1.0"

__all__ = [
    "ILQRConfig",
    "Status",
    "Problem",
    "rollout",
    "total_cost",
    "linearize_dynamics",
    "quadratize_running_cost",
    "quadratize_final_cost",
    "dynamics_hessians",
    "backward_pass",
    "forward_pass",
    "solve",
    "fit",
    "SolverResult",
    "make_solver",
]
