"""World-frame forward kinematics over the kinematic tree.

The differentiable equivalent of RigidBodyDynamics.jl's
``transform_to_root`` as the reference's (dead) cost library uses it
(src/cost_functions.jl:12-16: a body-fixed point mapped to root frame for a
workspace-distance cost), and the pose source for 3-D visualization
(the reference renders via MeshCatMechanisms,
test/RBD_2_link_example/animate_RBD_2_link.jl:40-56).

All loops unroll at trace time over the static tree, so every function
jits, vmaps, and differentiates like the dynamics layer.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ilqr_tpu.models.rbd.rotations import (
    axis_angle_to_rotmat,
    quat_to_rotmat,
    rpy_to_rotmat,
)
from ilqr_tpu.models.rbd.urdf import Mechanism


def joint_pose(joint, q, dtype):
    """Child-link pose in the parent-link frame at joint configuration
    ``q``: returns ``(R [3,3], p [3])`` — the same pose
    :func:`ilqr_tpu.models.rbd.dynamics._joint_X_and_S` turns into a
    spatial transform."""

    R_origin = rpy_to_rotmat(jnp.asarray(joint.origin_rpy, dtype))
    p_origin = jnp.asarray(joint.origin_xyz, dtype)

    if joint.joint_type in ("revolute", "continuous"):
        axis = jnp.asarray(joint.axis, dtype)
        return R_origin @ axis_angle_to_rotmat(axis, q[0]), p_origin
    if joint.joint_type == "prismatic":
        axis = jnp.asarray(joint.axis, dtype)
        return R_origin, p_origin + R_origin @ (axis * q[0])
    if joint.joint_type == "fixed":
        return R_origin, p_origin
    if joint.joint_type == "floating":
        # q = [quat (scalar-first, 4), pos (3)].
        return (R_origin @ quat_to_rotmat(q[:4]),
                p_origin + R_origin @ q[4:7])
    raise ValueError(f"unsupported joint type {joint.joint_type}")


def forward_kinematics(mech: Mechanism, q) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """World pose ``(R_world_link [3,3], p_world_link [3])`` of every body,
    in tree order (the ``transform_to_root`` of each link)."""

    dtype = q.dtype
    poses: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for i, joint in enumerate(mech.joints):
        lo, hi = mech.q_slices[i]
        R_j, p_j = joint_pose(joint, q[lo:hi], dtype)
        parent = mech.parents[i]
        if parent < 0:
            poses.append((R_j, p_j))
        else:
            R_p, p_p = poses[parent]
            poses.append((R_p @ R_j, p_p + R_p @ p_j))
    return poses


def body_index(mech: Mechanism, body_name: str) -> int:
    for i, link in enumerate(mech.links):
        if link.name == body_name:
            return i
    raise KeyError(f"no body named {body_name!r}; have "
                   f"{[l.name for l in mech.links]}")


def body_point_in_world(mech: Mechanism, q, body: int | str, point):
    """A body-fixed point mapped to the world (root) frame — the
    reference's ``transform(state, Point3D(body_frame, point), root_frame)``
    pattern (src/cost_functions.jl:12-16)."""

    idx = body_index(mech, body) if isinstance(body, str) else body
    R, p = forward_kinematics(mech, q)[idx]
    return p + R @ jnp.asarray(point, q.dtype)
