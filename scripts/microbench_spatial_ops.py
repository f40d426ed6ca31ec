"""Is the RBD derivative sweep paying an MXU tax on its 6x6 spatial algebra?

Times a chain of 6x6 matmul + matvec ops (the shape of CRBA/RNEA inner
loops) at sweep scale (T*B*tangents lanes), written two ways:

  dot   — plain ``@`` (lowers to dot_general, batched tiny matmuls)
  vpu   — smallmat broadcast-multiply-reduce (pure elementwise + reduce)

under the lane-batch vmap layout derivatives_bl uses (batch minor).

    python scripts/microbench_spatial_ops.py [--lanes 102400] [--depth 24]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ilqr_tpu.ops import smallmat as sm
from ilqr_tpu.precision import highest_precision


def measure(f, *args, repeats=5):
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=102400)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    B, D = args.lanes, args.depth
    key = jax.random.PRNGKey(0)
    X = 0.1 * jax.random.normal(key, (6, 6, B), jnp.float32)
    v = jax.random.normal(key, (6, B), jnp.float32)

    @highest_precision
    def chain_dot(X, v):
        # per-lane: w = X @ v; Y = X.T @ X; chained D times
        def one(Xl, vl):
            for _ in range(D):
                vl = Xl @ vl
                Xl = Xl.T @ Xl * 0.5 + jnp.eye(6) * 0.5
            return Xl, vl
        return jax.vmap(one, in_axes=(-1, -1), out_axes=-1)(X, v)

    @highest_precision
    def chain_vpu(X, v):
        def one(Xl, vl):
            for _ in range(D):
                vl = sm.mv(Xl, vl)
                Xl = sm.mtm(Xl, Xl) * 0.5 + jnp.eye(6) * 0.5
            return Xl, vl
        return jax.vmap(one, in_axes=(-1, -1), out_axes=-1)(X, v)

    print(f"device={jax.devices()[0]} lanes={B} depth={D}", flush=True)
    for tag, f in [("dot (@ -> dot_general)", chain_dot),
                   ("vpu (smallmat bcast-reduce)", chain_vpu)]:
        best, c = measure(jax.jit(f), X, v)
        flops = B * D * (6 * 6 * 2 + 6 * 6 * 6 * 2)
        print(f"  {tag:32s} {best*1e3:8.2f} ms  "
              f"({flops/best/1e12:.3f} TFLOP/s)  compile {c:.1f}s",
              flush=True)
    # equality
    a = jax.jit(chain_dot)(X, v)
    b = jax.jit(chain_vpu)(X, v)
    print("  max diff:", float(jnp.max(jnp.abs(a[0] - b[0]))),
          float(jnp.max(jnp.abs(a[1] - b[1]))))


if __name__ == "__main__":
    main()
