"""Differentiable rigid-body dynamics in JAX.

The TPU-native replacement for the reference's RigidBodyDynamics.jl +
Attitude.jl model layer (test/RBD_2_link_example/RBD_helper_functions.jl):
a URDF parser, Featherstone spatial algebra, CRBA mass matrix, RNEA bias
forces, floating-base support with an MRP attitude chart, and an RK4
discrete-dynamics factory — all pure JAX (jit / vmap / jacfwd safe).
"""

from ilqr_tpu.models.rbd.urdf import Mechanism, parse_urdf
from ilqr_tpu.models.rbd.dynamics import (
    crba_mass_matrix,
    rnea_bias,
    forward_dynamics,
)
from ilqr_tpu.models.rbd.model import (
    make_rbd_dynamics,
    make_rbd_arm_problem,
    rbd_to_mrp_state,
    mrp_to_rbd_state,
)

__all__ = [
    "Mechanism",
    "parse_urdf",
    "crba_mass_matrix",
    "rnea_bias",
    "forward_dynamics",
    "make_rbd_dynamics",
    "make_rbd_arm_problem",
    "rbd_to_mrp_state",
    "mrp_to_rbd_state",
]
