"""Batching-aware dispatch for the backward Riccati recursion.

``solve`` is written per-scenario and scaled with ``vmap``; the fused
Pallas kernel (ops/pallas_riccati.py) wants the whole batch at once.  A
``jax.custom_batching.custom_vmap`` op bridges the two: unbatched calls run
the plain ``lax.scan`` recursion, and when the op is vmapped over a
scenario axis the batching rule routes to the single-launch Pallas kernel
with the batch on the vector lanes.  Numerics are identical (same unrolled
algebra) — only the schedule changes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_batched


def pallas_interpret_default() -> bool:
    """Run the kernel in interpreter mode off-TPU (tests on CPU) unless
    overridden via ILQR_TPU_PALLAS_INTERPRET=0/1."""

    env = os.environ.get("ILQR_TPU_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def make_riccati_op(symmetrize: bool, unroll: int, interpret: bool):
    """Build the custom_vmap'd riccati op for a static config."""

    @jax.custom_batching.custom_vmap
    def riccati_op(As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN, reg):
        from ilqr_tpu.backward import riccati_scan

        T = As.shape[0]
        dtype = As.dtype
        res = riccati_scan(
            As, Bs, jnp.zeros((T,), dtype), qx, ru, Qxx, Pux, Ruu,
            jnp.zeros((), dtype), qxN, QN,
            reg=reg, symmetrize=symmetrize, unroll=unroll)
        return res.duffs, res.Ks, res.dV1, res.dV2

    @riccati_op.def_vmap
    def _rule(axis_size, in_batched, As, Bs, qx, ru, Qxx, Pux, Ruu,
              qxN, QN, reg):
        args = (As, Bs, qx, ru, Qxx, Pux, Ruu, qxN, QN)
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched[:9])
        )
        reg_b = reg if in_batched[9] else jnp.broadcast_to(reg, (axis_size,))
        outs = riccati_scan_pallas_batched(
            *args, reg=reg_b, symmetrize=symmetrize, interpret=interpret)
        return outs, (True, True, True, True)

    return riccati_op
