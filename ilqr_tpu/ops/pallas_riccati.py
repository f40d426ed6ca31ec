"""Fused Pallas TPU kernel for the batched backward Riccati scan.

Why a kernel: under ``vmap``, XLA's ``lax.scan`` writes the value carry
(S, s) to HBM every timestep and launches dozens of small fused ops per
step — per-step overhead dominates for tiny n, m.  This kernel runs the
whole T-step recursion in ONE launch: the carry lives in VMEM scratch, the
per-step local models (A, B, cost blocks) stream in batch-last layout
``[T, ..., B]`` with Pallas' automatic double-buffered pipeline, and every
scalar of the n^3 recursion is a [B]-wide VPU op (the scenario batch sits
on the vector lanes).  The algebra is bit-identical to
:func:`ilqr_tpu.backward.riccati_step` (reference:
src/backward_pass.jl:177-273).

Matrices are unrolled at trace time into "scalar-of-vectors" form — a
matrix is a Python list-of-lists of batch tiles — and the batch is shaped
``(B/128, 128)`` so every entry is a stack of full native (8, 128) vector
tiles (a flat ``[B]`` vector would occupy one sublane in eight, wasting
87.5% of the VPU).

Layout contract: ``B`` (the scenario batch) must be a multiple of 128
(lane width); the public wrapper pads.  Time is the Pallas grid dimension,
iterated ``t = T-1 … 0`` via the BlockSpec index maps.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


# ---------------------------------------------------------------------------
# Scalar-of-vectors small algebra (entries are [B] arrays).
# ---------------------------------------------------------------------------

def _load_mat_t(ref, t, r, c):
    """ref block [tb, r, c, Bs, 128] at block-local step ``t`` →
    list-of-lists of (Bs, 128) tiles."""

    return [[ref[t, i, j, :, :] for j in range(c)] for i in range(r)]


def _load_vec_t(ref, t, r):
    """ref block [tb, r, Bs, 128] at block-local step ``t`` → list of
    (Bs, 128) tiles."""

    return [ref[t, i, :, :] for i in range(r)]


def _mm(A, B_):
    """A [r x k] @ B [k x c] in SoV form."""

    r, k, c = len(A), len(B_), len(B_[0])
    return [[functools.reduce(lambda a, b: a + b,
                              [A[i][t] * B_[t][j] for t in range(k)])
             for j in range(c)] for i in range(r)]


def _mtm(A, B_):
    """A.T @ B for A [k x r], B [k x c]."""

    k, r, c = len(A), len(A[0]), len(B_[0])
    return [[functools.reduce(lambda a, b: a + b,
                              [A[t][i] * B_[t][j] for t in range(k)])
             for j in range(c)] for i in range(r)]


def _mv(A, x):
    r, k = len(A), len(x)
    return [functools.reduce(lambda a, b: a + b,
                             [A[i][t] * x[t] for t in range(k)])
            for i in range(r)]


def _mtv(A, x):
    k, r = len(A), len(A[0])
    return [functools.reduce(lambda a, b: a + b,
                             [A[t][i] * x[t] for t in range(k)])
            for i in range(r)]


def _vv(x, y):
    return functools.reduce(lambda a, b: a + b,
                            [x[t] * y[t] for t in range(len(x))])


def _transpose(A):
    return [[A[i][j] for i in range(len(A))] for j in range(len(A[0]))]


def _add(A, B_):
    return [[A[i][j] + B_[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def _cholesky_sov(A, reg):
    """Lower Cholesky of (A + reg I) in SoV form (Cholesky–Crout unrolled;
    same recurrence as ops/linalg.cholesky_small).

    Returns ``(L, inv_diag)``: divides and square roots run at a fraction
    of VPU multiply throughput and the solves below would otherwise spend
    ~as many cycles on divides as the whole recursion spends on
    multiply-adds, so every ``/ L[j][j]`` is precomputed once here as a
    reciprocal (``rsqrt``: one transcendental instead of sqrt + divide)
    and the solves are pure multiply-adds.
    """

    m = len(A)
    L = [[None] * m for _ in range(m)]
    inv_diag = [None] * m
    for j in range(m):
        s = A[j][j] + reg
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        inv_d = jax.lax.rsqrt(s)
        L[j][j] = s * inv_d          # == sqrt(s)
        inv_diag[j] = inv_d
        for i in range(j + 1, m):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L, inv_diag


def _cho_solve_vec(L, inv_diag, b):
    """Solve (L L^T) x = b, b a SoV vector (division-free)."""

    m = len(L)
    y = [None] * m
    for i in range(m):
        s = b[i]
        for j in range(i):
            s = s - L[i][j] * y[j]
        y[i] = s * inv_diag[i]
    x = [None] * m
    for i in reversed(range(m)):
        s = y[i]
        for j in range(i + 1, m):
            s = s - L[j][i] * x[j]
        x[i] = s * inv_diag[i]
    return x


def _cho_solve_mat(L, inv_diag, B_):
    cols = _transpose(B_)
    sol_cols = [_cho_solve_vec(L, inv_diag, col) for col in cols]
    return _transpose(sol_cols)


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _riccati_kernel(A_ref, B_ref, qx_ref, ru_ref, Qxx_ref, Pux_ref, Ruu_ref,
                    QN_ref, qxN_ref, reg_ref,
                    duff_ref, K_ref, dv1_ref, dv2_ref,
                    S_scr, s_scr, *, n, m, symmetrize, time_block):
    # grid = (batch tiles, time blocks); time iterates fastest so the
    # value carry in scratch is coherent per batch tile.
    i = pl.program_id(1)
    reg = reg_ref[0, :, :]  # per-scenario Tikhonov term, (Bs, 128)

    # Seed the carry from the terminal quadratization on the first grid step
    # (t = T-1), reference src/backward_pass.jl:335-336.
    @pl.when(i == 0)
    def _():
        S_scr[...] = QN_ref[...]
        s_scr[...] = qxN_ref[...]

    # The grid step owns ``time_block`` consecutive timesteps (latest
    # first): per-step compute here is a few MFLOP — far below the cost of
    # a grid iteration + its double-buffered DMA turnaround — so blocking
    # several steps per grid iteration amortizes that fixed overhead.
    # Between the unrolled steps the carry lives in REGISTERS (plain
    # values), touching the VMEM scratch only at block entry/exit.
    S = [[S_scr[a, b, :, :] for b in range(n)] for a in range(n)]
    s_vec = [s_scr[a, :, :] for a in range(n)]

    for ct in reversed(range(time_block)):
        A = _load_mat_t(A_ref, ct, n, n)
        Bm = _load_mat_t(B_ref, ct, n, m)
        qx = _load_vec_t(qx_ref, ct, n)
        ru = _load_vec_t(ru_ref, ct, m)
        Qxx = _load_mat_t(Qxx_ref, ct, n, n)
        Pux = _load_mat_t(Pux_ref, ct, m, n)
        Ruu = _load_mat_t(Ruu_ref, ct, m, m)

        BT_S = _mtm(Bm, S)                     # [m, n]
        g = [ru[a] + x for a, x in enumerate(_mtv(Bm, s_vec))]
        G = _add(Pux, _mm(BT_S, A))            # [m, n]
        H = _add(Ruu, _mm(BT_S, Bm))           # [m, m]

        L, inv_diag = _cholesky_sov(H, reg)
        duff = [-x for x in _cho_solve_vec(L, inv_diag, g)]
        K = [[-x for x in row] for row in _cho_solve_mat(L, inv_diag, G)]

        H_duff = _mv(H, duff)
        s_new_part = _vv(duff, H_duff)
        dv1 = _vv(duff, g)
        KtHd = _mtv(K, H_duff)
        Ktg = _mtv(K, g)
        Gtd = _mtv(G, duff)
        At_s = _mtv(A, s_vec)
        s_next = [qx[a] + At_s[a] + KtHd[a] + Ktg[a] + Gtd[a]
                  for a in range(n)]

        SA = _mm(S, A)
        AtSA = _mtm(A, SA)
        HK = _mm(H, K)
        KtHK = _mtm(K, HK)
        KtG = _mtm(K, G)
        GtK = _transpose(KtG)
        S_next = [[Qxx[a][b] + AtSA[a][b] + KtHK[a][b] + KtG[a][b]
                   + GtK[a][b] for b in range(n)] for a in range(n)]
        if symmetrize:
            S_next = [[0.5 * (S_next[a][b] + S_next[b][a])
                       for b in range(n)] for a in range(n)]

        # Outputs for this timestep.
        for a in range(m):
            duff_ref[ct, a, :, :] = duff[a]
            for b in range(n):
                K_ref[ct, a, b, :, :] = K[a][b]
        dv1_ref[ct, :, :] = dv1
        dv2_ref[ct, :, :] = 0.5 * s_new_part

        S, s_vec = S_next, s_next

    # Carry out to scratch for the next grid step.
    for a in range(n):
        s_scr[a, :, :] = s_vec[a]
        for b in range(n):
            S_scr[a, b, :, :] = S[a][b]


def riccati_scan_pallas_bl(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN,
                           reg, symmetrize: bool = True,
                           interpret: bool = False,
                           time_block=None, batch_sublanes=None):
    """Batch-LAST entry: ``As [T, n, n, B]`` etc., ``qxN [n, B]``,
    ``QN [n, n, B]``, ``reg`` scalar or ``[B]``.  Returns batch-last
    ``(duffs [T, m, B], Ks [T, m, n, B], dv1 [B], dv2 [B])``.

    This is the zero-copy path for the fused batched solver — the batch is
    already the minor axis, so only a cheap trailing reshape/pad to
    ``(B/128, 128)`` tiles happens here.
    """

    T, n, _, Bt = As.shape
    m = Bs.shape[2]
    dtype = As.dtype

    TILE = 8 * LANE
    Bp = ((Bt + TILE - 1) // TILE) * TILE
    Bsub = Bp // LANE

    def tile(x):
        if Bp != Bt:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - Bt)],
                        constant_values=1.0)
        return x.reshape(x.shape[:-1] + (Bsub, LANE))

    reg_arr = jnp.broadcast_to(jnp.asarray(reg, dtype), (Bt,))
    duffs_l, Ks_l, dv1_l, dv2_l = _riccati_pallas_call(
        tile(As), tile(Bs), tile(qx), tile(ru), tile(Qxx), tile(Pux),
        tile(Ruu), tile(QN), tile(qxN), tile(reg_arr)[None],
        T=T, n=n, m=m, Bsub=Bsub, dtype=dtype,
        symmetrize=symmetrize, interpret=interpret, time_block=time_block,
        batch_sublanes=batch_sublanes)

    def untile(x):
        return x.reshape(x.shape[:-2] + (Bp,))[..., :Bt]

    return (untile(duffs_l), untile(Ks_l),
            untile(dv1_l).sum(axis=0), untile(dv2_l).sum(axis=0))


def riccati_scan_pallas_batched(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN,
                                reg, symmetrize: bool = True,
                                interpret: bool = False,
                                time_block=None):
    """Batched backward Riccati recursion in one fused kernel launch.

    Batch-FIRST inputs: ``As [Bt, T, n, n]``, ``Bs [Bt, T, n, m]``,
    ``qx [Bt, T, n]``, ``ru [Bt, T, m]``, ``Qxx [Bt, T, n, n]``,
    ``Pux [Bt, T, m, n]``, ``Ruu [Bt, T, m, m]``, ``qxN [Bt, n]``,
    ``QN [Bt, n, n]``.  Returns ``(duffs [Bt, T, m], Ks [Bt, T, m, n],
    dv1 [Bt], dv2 [Bt])``.

    The batch is moved to the trailing (lane) axis and padded to a multiple
    of 128 internally.
    """

    Bt, T, n, _ = As.shape
    m = Bs.shape[-1]
    dtype = As.dtype

    # Pad the batch to a whole number of (8, 128) f32 tiles and shape it
    # (Bsub, 128): full sublane+lane utilization for every elementwise op.
    TILE = 8 * LANE
    Bp = ((Bt + TILE - 1) // TILE) * TILE
    Bsub = Bp // LANE

    def to_batch_last(x):
        # [Bt, T, ...] -> [T, ..., Bsub, 128]
        x = jnp.moveaxis(x, 0, -1)
        if Bp != Bt:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - Bt)]
            x = jnp.pad(x, pad, constant_values=1.0)  # benign pad values
        return x.reshape(x.shape[:-1] + (Bsub, LANE))

    A_l = to_batch_last(As)        # [T, n, n, Bsub, 128]
    B_l = to_batch_last(Bs)        # [T, n, m, Bsub, 128]
    qx_l = to_batch_last(qx)       # [T, n, Bsub, 128]
    ru_l = to_batch_last(ru)       # [T, m, Bsub, 128]
    Qxx_l = to_batch_last(Qxx)
    Pux_l = to_batch_last(Pux)
    Ruu_l = to_batch_last(Ruu)

    def term_batch_last(x):
        x = jnp.moveaxis(x, 0, -1)
        if Bp != Bt:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - Bt)],
                        constant_values=1.0)
        return x.reshape(x.shape[:-1] + (Bsub, LANE))

    qxN_l = term_batch_last(qxN)   # [n, Bsub, 128]
    QN_l = term_batch_last(QN)     # [n, n, Bsub, 128]

    reg_arr = jnp.broadcast_to(jnp.asarray(reg, dtype), (Bt,))
    reg_l = jnp.pad(reg_arr, (0, Bp - Bt),
                    constant_values=1.0).reshape(1, Bsub, LANE)

    duffs_l, Ks_l, dv1_l, dv2_l = _riccati_pallas_call(
        A_l, B_l, qx_l, ru_l, Qxx_l, Pux_l, Ruu_l, QN_l, qxN_l, reg_l,
        T=T, n=n, m=m, Bsub=Bsub, dtype=dtype,
        symmetrize=symmetrize, interpret=interpret, time_block=time_block)

    def from_batch_last(x):
        # [T, ..., Bsub, 128] -> [Bt, T, ...]
        x = x.reshape(x.shape[:-2] + (Bp,))
        return jnp.moveaxis(x, -1, 0)[:Bt]

    duffs = from_batch_last(duffs_l)
    Ks = from_batch_last(Ks_l)
    dv1 = from_batch_last(dv1_l).sum(axis=-1)
    dv2 = from_batch_last(dv2_l).sum(axis=-1)
    return duffs, Ks, dv1, dv2


def _pick_time_block(T, n, m, Bsub, itemsize=4,
                     vmem_budget=9 * 1024 * 1024):
    """Largest divisor of T (<= 16) whose double-buffered input+output
    blocks fit the VMEM budget.  One timestep's streamed bytes:
    inputs A, B, qx, ru, Qxx, Pux, Ruu + outputs duff, K, dv1, dv2."""

    per_step = (  # in units of (Bsub * LANE) tiles
        n * n + n * m + n + m + n * n + m * n + m * m   # inputs
        + m + m * n + 2                                  # outputs
    ) * Bsub * LANE * itemsize
    best = 1
    for tb in (2, 4, 8, 16):
        if T % tb == 0 and 2 * tb * per_step <= vmem_budget:
            best = tb
    return best


def _riccati_pallas_call(A_l, B_l, qx_l, ru_l, Qxx_l, Pux_l, Ruu_l,
                         QN_l, qxN_l, reg_l, *, T, n, m, Bsub, dtype,
                         symmetrize, interpret, time_block=None,
                         batch_sublanes=None):
    """Invoke the kernel on pre-tiled ``[T, ..., Bsub, 128]`` arrays."""

    # Batch tiling: each grid instance works on BT sublanes (one native
    # (8, 128) f32 vreg per SoV scalar).  At Bsub = 32 a scalar is 4 vregs
    # and the recursion's working set (~70 input tiles + intermediates)
    # spills registers; BT = 8 keeps every scalar a single vreg.
    # ``batch_sublanes`` overrides for the interleaved-recursions
    # experiment (BT = 16 -> every SoV op is two independent vreg
    # instructions, round-robining two dependency chains per instance).
    BT = min(batch_sublanes or 8, Bsub)
    assert Bsub % BT == 0, (Bsub, BT)
    n_btiles = Bsub // BT

    if time_block is None:
        # Interpret mode (the CPU test path) executes the kernel body
        # op-by-op: a time-blocked body is tb x the graph and becomes
        # pathologically slow, so auto-pick only targets real Mosaic
        # compiles.  Tests cover the blocked path via the explicit
        # ``time_block`` override on tiny shapes.
        time_block = 1 if interpret else _pick_time_block(T, n, m, BT)
    tb = time_block
    assert T % tb == 0, (T, tb)
    n_blocks = T // tb

    # Grid = (batch tiles, time blocks), time fastest: per batch tile the
    # kernel sees timesteps [T - (i+1)*tb, T - i*tb) latest-first and the
    # carry scratch stays coherent.  Index maps are in units of BLOCKS.
    def tmap(extra_dims):
        def index_map(b, i):
            return (n_blocks - 1 - i,) + (0,) * (extra_dims - 2) + (b, 0)
        return index_map

    def cmap(extra_dims):
        def index_map(b, i):
            return (0,) * (extra_dims - 2) + (b, 0)
        return index_map

    in_specs = [
        pl.BlockSpec((tb, n, n, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n, m, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n, BT, LANE), tmap(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, m, BT, LANE), tmap(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, n, n, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, m, n, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, m, m, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n, BT, LANE), cmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, BT, LANE), cmap(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BT, LANE), cmap(3), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tb, m, BT, LANE), tmap(3), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, m, n, BT, LANE), tmap(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, BT, LANE), tmap(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, BT, LANE), tmap(2), memory_space=pltpu.VMEM),
    ]

    kernel = functools.partial(_riccati_kernel, n=n, m=m,
                               symmetrize=symmetrize, time_block=tb)

    return pl.pallas_call(
        kernel,
        grid=(n_btiles, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((T, m, Bsub, LANE), dtype),
            jax.ShapeDtypeStruct((T, m, n, Bsub, LANE), dtype),
            jax.ShapeDtypeStruct((T, Bsub, LANE), dtype),
            jax.ShapeDtypeStruct((T, Bsub, LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n, BT, LANE), dtype),
            pltpu.VMEM((n, BT, LANE), dtype),
        ],
    )(A_l, B_l, qx_l, ru_l, Qxx_l, Pux_l, Ruu_l, QN_l, qxN_l, reg_l)
