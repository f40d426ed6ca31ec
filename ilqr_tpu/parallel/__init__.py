"""Scaling layer: batched (vmap), sharded (mesh + shard_map), and multi-host
scenario-parallel solving.

The reference is single-threaded and single-process (no parallel or
distributed code exists anywhere in it — SURVEY.md §2.4); this package is
the TPU-native replacement: scenario data-parallelism is the headline axis
(vmap within a chip, a ``scenarios`` mesh axis across chips/hosts), with
convergence flags and throughput counters reduced via ``psum`` over ICI.
"""

from ilqr_tpu.parallel.batching import batch_solve, make_batch_solver
from ilqr_tpu.parallel.mesh import make_scenario_mesh, sharded_batch_solve
from ilqr_tpu.parallel.pipeline import make_pipeline_mesh, pipelined_solve

__all__ = [
    "batch_solve",
    "make_batch_solver",
    "make_pipeline_mesh",
    "make_scenario_mesh",
    "pipelined_solve",
    "sharded_batch_solve",
]
