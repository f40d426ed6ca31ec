"""Matmul precision policy.

On TPU, jnp matmuls default to bf16 multiplication with f32 accumulation.
That is the right trade for large neural-net matmuls, but catastrophic for
a 300-step Riccati recursion and closed-loop rollouts over 4x4 matrices:
bf16 feedback gains destabilize the rollout (observed: NaN costs at T=300
in f32 on a v5e that are absent on CPU).  These matrices are tiny — they
run on the VPU regardless — so full f32 precision costs nothing.

Every public entry point of the solver stack is wrapped with
:func:`highest_precision`, which scopes ``jax.default_matmul_precision
("highest")`` around tracing.  User dynamics/cost callables traced inside
inherit the policy.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Decorator: trace ``fn`` under full (f32) matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
