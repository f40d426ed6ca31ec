"""Rotation charts: quaternions, MRPs, and their kinematics.

Replaces the reference's Attitude.jl usage
(test/RBD_2_link_example/RBD_helper_functions.jl:29-41,67): quaternions are
scalar-first ``[w, x, y, z]`` unit quaternions; MRPs (modified Rodrigues
parameters) are the 3-vector chart ``p = q_vec / (1 + q_w)`` the reference
uses as the floating base's attitude state for iLQR (a quaternion is
4-dimensional with a unit constraint; iLQR needs an unconstrained chart).

All formulas derived from the body-frame quaternion kinematics
``q̇ = 1/2 q ⊗ [0, ω]``; see the ``pdot_from_w`` docstring.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """Cross-product matrix: ``skew(v) @ w == v × w``."""

    z = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def quat_multiply(q1, q2):
    """Hamilton product, scalar-first."""

    w1, v1 = q1[0], q1[1:]
    w2, v2 = q2[0], q2[1:]
    w = w1 * w2 - v1 @ v2
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w[None], v])


def quat_to_rotmat(q):
    """Rotation matrix R such that ``R @ v_body = v_world`` for the active
    rotation represented by unit quaternion q (scalar-first)."""

    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def p_from_q(q):
    """MRP from quaternion: ``p = q_vec / (1 + q_w)``
    (Attitude.jl semantics, used at RBD_helper_functions.jl:31)."""

    return q[1:] / (1.0 + q[0])


def q_from_p(p):
    """Quaternion from MRP: ``q = [1 - p·p, 2p] / (1 + p·p)``
    (RBD_helper_functions.jl:40)."""

    pp = p @ p
    return jnp.concatenate([(1.0 - pp)[None], 2.0 * p]) / (1.0 + pp)


def pdot_from_w(p, w):
    """MRP kinematics for body-frame angular velocity ``w``:

        ṗ = 1/4 [(1 - p·p) I + 2 skew(p) + 2 p pᵀ] ω

    Derivation: with q = (s, v), body-frame kinematics ṡ = -1/2 v·ω,
    v̇ = 1/2 (s ω + v × ω); substituting v = (1+s)p and
    s = (1 - p·p)/(1 + p·p) yields the formula.  Matches Attitude.jl's
    ``pdot_from_w`` (RBD_helper_functions.jl:67).
    """

    pp = p @ p
    B = (1.0 - pp) * jnp.eye(3, dtype=p.dtype) + 2.0 * skew(p) + 2.0 * jnp.outer(p, p)
    return 0.25 * B @ w


def rpy_to_rotmat(rpy):
    """URDF fixed-axis roll-pitch-yaw to rotation matrix: R = Rz(y)Ry(p)Rx(r)."""

    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    Rx = jnp.asarray([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = jnp.asarray([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = jnp.asarray([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def axis_angle_to_rotmat(axis, angle):
    """Rodrigues formula for a unit axis."""

    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)
