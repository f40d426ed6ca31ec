"""Scalar-expression spatial algebra: list-of-scalars vectors/matrices.

The jnp-array RBD algorithms (``dynamics.py``) build every 6-vector and
6x6 transform with ``jnp.stack``/``jnp.block``/``.at[].set`` — each one a
fusion boundary, so under the iLQR derivative sweep every intermediate
materializes at ``[tangents, T*B]`` shape in HBM and the sweep runs two
orders of magnitude above its bandwidth bound (BENCH.md round 4).  These
helpers express the same algebra on plain Python lists whose entries are
jnp SCALARS (``[B]``-wide vectors under vmap): the whole recursion becomes
one fusable elementwise DAG with no stacking until the final output.
Measured: 1.8x on the 16-tangent RNEA-bias JVP sweep at [T*B] scale.

Everything here is trace-time Python — the lists disappear at trace time;
only the scalar jnp ops remain.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


# --- generic list linear algebra -------------------------------------------

def mT(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def mm(A, B):
    K = len(B)
    return [[sum(A[i][k] * B[k][j] for k in range(K))
             for j in range(len(B[0]))] for i in range(len(A))]


def mv(A, x):
    return [sum(A[i][k] * x[k] for k in range(len(x)))
            for i in range(len(A))]


def vadd(a, b):
    return [x + y for x, y in zip(a, b)]


# --- 3-D / spatial constructions -------------------------------------------

def skew_l(v):
    z = v[0] * 0.0
    return [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]


def zeros33(like):
    z = like * 0.0
    return [[z] * 3 for _ in range(3)]


def block66(TL, TR, BL, BR):
    top = [TL[i] + TR[i] for i in range(3)]
    bot = [BL[i] + BR[i] for i in range(3)]
    return top + bot


def crm_l(v):
    w, vl = v[:3], v[3:]
    return block66(skew_l(w), zeros33(v[0]), skew_l(vl), skew_l(w))


def crf_l(v):
    C = crm_l(v)
    return [[-C[j][i] for j in range(6)] for i in range(6)]


def quat_to_R_l(q):
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


def axis_angle_R_l(axis, angle):
    """Rodrigues formula; ``axis`` is a static unit 3-vector of floats."""

    K = [[0.0, -axis[2], axis[1]],
         [axis[2], 0.0, -axis[0]],
         [-axis[1], axis[0], 0.0]]
    KK = [[sum(K[i][k] * K[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    s, c = jnp.sin(angle), jnp.cos(angle)
    I = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    return [[I[i][j] + s * K[i][j] + (1.0 - c) * KK[i][j]
             for j in range(3)] for i in range(3)]


def xform_from_pose_l(R, p):
    """Motion transform A→B for frame B with rotation R (B axes in A) and
    origin p (B origin in A): ``X = [[E, 0], [-E skew(p), E]]``, E = R^T
    (same as spatial.xform_from_pose)."""

    E = mT(R)
    ES = mm(E, skew_l(p))
    negES = [[-ES[i][j] for j in range(3)] for i in range(3)]
    return block66(E, zeros33(p[0]), negES, E)


# --- static (python-float) model data --------------------------------------

def rpy_R_static(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    Rx = [[1, 0, 0], [0, cr, -sr], [0, sr, cr]]
    Ry = [[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]]
    Rz = [[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]]

    def m(A, B):
        return [[sum(A[i][k] * B[k][j] for k in range(3))
                 for j in range(3)] for i in range(3)]

    return m(Rz, m(Ry, Rx))


def spatial_inertia_static(mass, inertia, com):
    """6x6 spatial inertia as python floats (static per mechanism; same
    formula as spatial.spatial_inertia)."""

    C = [[0.0, -com[2], com[1]], [com[2], 0.0, -com[0]],
         [-com[1], com[0], 0.0]]
    CCt = [[sum(C[i][k] * C[j][k] for k in range(3)) for j in range(3)]
           for i in range(3)]
    top = [[inertia[i][j] + mass * CCt[i][j] for j in range(3)]
           for i in range(3)]
    mC = [[mass * C[i][j] for j in range(3)] for i in range(3)]
    mCt = [[mass * C[j][i] for j in range(3)] for i in range(3)]
    mI = [[mass if i == j else 0.0 for j in range(3)] for i in range(3)]
    return block66(top, mC, mCt, mI)
