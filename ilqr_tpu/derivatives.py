"""Local approximation layer: whole-horizon derivatives in one vmapped sweep.

The reference computes every Jacobian/Hessian one timestep at a time inside
the backward loop (src/backward_pass.jl:339-351, calling
``linearize_dynamics`` :25-40 and ``immediate_cost_quadratization`` :81-109
per step).  On TPU that serialization throws away all the parallelism, so
here the whole horizon is differentiated in a single ``vmap`` over time —
one big batched computation that XLA tiles onto the vector units.

Forward-mode (``jacfwd``) is used for the dynamics (n+m tangent sweeps, the
same strategy as ForwardDiff.jl's dual numbers) and forward-over-reverse for
the Hessians.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def linearize_dynamics(dynamics: Callable, xs: jax.Array, us: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """Linearize ``dynamics`` around every point of a trajectory at once.

    ``xs: [T, n]``, ``us: [T, m]`` → ``(As [T, n, n], Bs [T, n, m])`` with
    ``A_k = df/dx``, ``B_k = df/du`` (reference: src/backward_pass.jl:25-40,
    but batched — the batched variant the reference's own stale test
    ``test/test_linearize_dynamics.jl:10`` expected and src never provided).
    """

    jac = jax.jacfwd(dynamics, argnums=(0, 1))
    As, Bs = jax.vmap(jac)(xs, us)
    return As, Bs


def quadratize_running_cost(cost: Callable, xs: jax.Array, us: jax.Array):
    """Second-order expansion of the running cost along the whole horizon.

    Returns ``(q [T], qx [T,n], ru [T,m], Qxx [T,n,n], Pux [T,m,n],
    Ruu [T,m,m])`` — the (q_i, 𝐪_i, 𝐫_i, 𝐐_i, 𝐏_i, 𝐑_i) of
    src/backward_pass.jl:81-109, with ``Pux = d²L/du dx`` laid out ``[m, n]``
    exactly as the reference's ``jacobian(x -> dL/du, x)`` (:99).
    """

    n = xs.shape[-1]

    # One gradient and one forward-over-reverse Hessian over the
    # concatenated z = (x, u) — a single AD sweep yields all five blocks
    # (the reference runs five separate ForwardDiff passes per step,
    # src/backward_pass.jl:95-108).
    def cost_z(z):
        return cost(z[:n], z[n:])

    grad_z = jax.grad(cost_z)
    hess_z = jax.jacfwd(grad_z)

    def one_point(x, u):
        z = jnp.concatenate([x, u])
        q = cost_z(z)
        gz = grad_z(z)
        Hz = hess_z(z)
        qx, ru = gz[:n], gz[n:]
        Qxx = Hz[:n, :n]
        Pux = Hz[n:, :n]  # d2L/du dx, [m, n]
        Ruu = Hz[n:, n:]
        return q, qx, ru, Qxx, Pux, Ruu

    return jax.vmap(one_point)(xs, us)


def quadratize_final_cost(final_cost: Callable, x_final: jax.Array):
    """Terminal expansion ``(q_N, q_N_x [n], Q_N [n,n])``.

    Reference: src/backward_pass.jl:134-153.
    """

    q = final_cost(x_final)
    qx = jax.grad(final_cost)(x_final)
    Qxx = jax.jacfwd(jax.grad(final_cost))(x_final)
    return q, qx, Qxx


# ---------------------------------------------------------------------------
# Problem-aware sweeps: use analytic overrides when the Problem carries them.
# ---------------------------------------------------------------------------

def problem_linearize(problem, xs, us):
    """Whole-horizon ``(As, Bs)`` for a Problem — the user's analytic
    ``dynamics_jacobians`` when provided, autodiff otherwise."""

    if problem.dynamics_jacobians is not None:
        return jax.vmap(problem.dynamics_jacobians)(xs, us)
    return linearize_dynamics(problem.dynamics, xs, us)


def problem_quadratize_running(problem, xs, us):
    """Whole-horizon running-cost quadratization for a Problem."""

    if problem.cost_quadratization is not None:
        return jax.vmap(problem.cost_quadratization)(xs, us)
    return quadratize_running_cost(problem.cost, xs, us)


def problem_quadratize_final(problem, x_final):
    """Terminal quadratization for a Problem."""

    if problem.final_cost_quadratization is not None:
        return problem.final_cost_quadratization(x_final)
    return quadratize_final_cost(problem.final_cost, x_final)


def dynamics_hessians(dynamics: Callable, xs: jax.Array, us: jax.Array
                      ) -> jax.Array:
    """Second-order dynamics tensor along the whole horizon (DDP extension).

    Returns ``Fzz [T, n, n+m, n+m]`` with ``Fzz[t, k, i, j] =
    d2 f_k / dz_i dz_j`` at ``z = (x_t, u_t)`` — the tensor the full DDP
    recursion contracts with the value gradient.  The reference solver is
    pure iLQR (first-order dynamics only, src/backward_pass.jl:25-40 stops
    at the Jacobian), so this has no reference counterpart; it feeds
    ``ILQRConfig(ddp=True)``.

    Computed as one fwd-over-fwd sweep vmapped over time.  Memory is
    ``T * n * (n+m)^2`` floats — fine for small models (2-link: 144
    floats/step), and the reason ``ddp`` is an explicit opt-in for large
    ones (RBD n=16, m=8: 9.2k floats/step).
    """

    n = xs.shape[-1]

    def f_z(z):
        return dynamics(z[:n], z[n:])

    hess = jax.jacfwd(jax.jacfwd(f_z))

    def one(x, u):
        H = hess(jnp.concatenate([x, u]))
        # Mixed partials are symmetric; enforce against roundoff drift so
        # the contracted Quu/Qxx blocks stay symmetric.
        return 0.5 * (H + jnp.swapaxes(H, -1, -2))

    return jax.vmap(one)(xs, us)


def problem_dynamics_hessians(problem, xs, us):
    """Whole-horizon ``Fzz`` for a Problem — the user's analytic
    ``dynamics_hessians`` override when provided, autodiff otherwise."""

    if getattr(problem, "dynamics_hessians", None) is not None:
        return jax.vmap(problem.dynamics_hessians)(xs, us)
    return dynamics_hessians(problem.dynamics, xs, us)
