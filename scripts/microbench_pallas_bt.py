"""Pallas backward kernel: interleaved-recursions experiment (VERDICT r4
next #5).

The r4 kernel runs one serial Cholesky/solve dependency chain per grid
instance (BT = 8 sublanes = 1 vreg per SoV scalar); its ~1.3 ms residual
at B=4096/T=100 was diagnosed as the chain's latency floor.  This measures
BT = 16 / 32 (2 / 4 vregs per scalar → every SoV op becomes 2 / 4
independent back-to-back vector instructions, round-robining that many
independent batch-tile recursions through the VPU's latency slots) against
BT = 8, crossed with the time_block size.

    python scripts/microbench_pallas_bt.py [--T 100] [--batch 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from microbench_backward import make_models, timed_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--m", type=int, default=2)
    args = ap.parse_args()

    from ilqr_tpu.ops.pallas_riccati import riccati_scan_pallas_bl

    T, B, n, m = args.T, args.batch, args.n, args.m
    print(f"device: {jax.devices()[0]}  n={n} m={m} T={T} B={B}",
          flush=True)
    models = make_models(n, m, T, B)
    reg = jnp.full((B,), 0.01, jnp.float32)

    def feedback(out, carry):
        duffs, Ks, dv1, dv2 = out
        bump = jnp.zeros_like(carry[7]).at[0].set(1e-6 * dv1)
        return carry[:7] + (carry[7] + bump, carry[8])

    for bt in (8, 16, 32):
        for tb in (None, 4, 10):
            def one(*mo, bt=bt, tb=tb):
                return riccati_scan_pallas_bl(*mo, reg=reg,
                                              time_block=tb,
                                              batch_sublanes=bt)

            try:
                t0 = time.perf_counter()
                t = timed_chain(one, feedback, 10, *models)
                compile_s = time.perf_counter() - t0
                print(f"  BT={bt:2d} tb={str(tb):4s}: {t*1e3:7.3f} ms "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                print(f"  BT={bt:2d} tb={str(tb):4s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
