"""Featherstone 6-D spatial algebra (motion vectors ``[ω; v]``, angular
first), built as plain jnp ops so the whole stack is jit/vmap/jacfwd safe.

Trees are tiny (a handful of bodies), so 6x6 transforms are materialized
and composed with ordinary matmuls — unrolled at trace time over the static
tree, vectorized over scenario batches by ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ilqr_tpu.models.rbd.rotations import skew


def xform(E, r):
    """Motion-vector coordinate transform A→B, where frame B's pose in A is
    rotation ``R = E^T`` and origin ``r`` (Featherstone eq. 2.24):

        X = [[E, 0], [-E skew(r), E]]
    """

    Z = jnp.zeros((3, 3), dtype=E.dtype)
    return jnp.block([[E, Z], [-E @ skew(r), E]])


def xform_from_pose(R, p):
    """Transform taking motion vectors from frame A into frame B, given
    frame B's pose in A: rotation ``R`` (B axes in A coords) and origin
    ``p`` (B origin in A coords)."""

    return xform(R.T, p)


def crm(v):
    """Motion cross-product matrix: ``crm(v) @ m = v ×ₘ m``."""

    w, vl = v[:3], v[3:]
    Z = jnp.zeros((3, 3), dtype=v.dtype)
    return jnp.block([[skew(w), Z], [skew(vl), skew(w)]])


def crf(v):
    """Force cross-product matrix: ``crf(v) = -crm(v)^T``."""

    return -crm(v).T


def spatial_inertia(mass, inertia_com, com):
    """6x6 spatial inertia of a body in its link frame.

    ``inertia_com`` is the 3x3 rotational inertia about the COM (link-frame
    axes), ``com`` the COM position in the link frame (Featherstone eq.
    2.63):

        I = [[I_com + m c× c×ᵀ, m c×], [m c×ᵀ, m 1]]
    """

    C = skew(com)
    m = mass
    return jnp.block([
        [inertia_com + m * (C @ C.T), m * C],
        [m * C.T, m * jnp.eye(3, dtype=C.dtype)],
    ])
