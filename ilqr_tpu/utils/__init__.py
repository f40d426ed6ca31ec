"""Observability, checkpointing, and runtime checks."""

from ilqr_tpu.utils.metrics import IterationTrace, solve_with_trace
from ilqr_tpu.utils.checkpoint import save_solver_state, load_solver_state

__all__ = [
    "IterationTrace",
    "solve_with_trace",
    "save_solver_state",
    "load_solver_state",
]
