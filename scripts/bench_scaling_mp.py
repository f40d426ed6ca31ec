"""Multi-PROCESS weak-scaling bench over localhost jax.distributed.

Launches 1, 2, then 4 separate processes (one CPU device each, Gloo
collectives between them — the real multi-host code path, unlike the
single-process virtual mesh of bench_scaling.py) and reports solves/s +
efficiency.  On this 2-core host the 4-process row oversubscribes the
CPUs, so efficiency is a lower bound on the comm-path overhead.

    python scripts/bench_scaling_mp.py [--batch-per-proc 16] [--T 30]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.join(os.path.dirname(__file__), "..")


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_cluster(nproc, batch_per_proc, T, max_iter, repeats, timeout=900):
    port = free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    with tempfile.TemporaryDirectory() as td:
        files = [(open(os.path.join(td, f"o{i}"), "w+"),
                  open(os.path.join(td, f"e{i}"), "w+"))
                 for i in range(nproc)]
        procs = [
            subprocess.Popen(
                [sys.executable,
                 os.path.join("scripts", "_scaling_worker.py"),
                 str(i), str(nproc), str(port), str(batch_per_proc),
                 str(T), str(max_iter), str(repeats)],
                cwd=REPO, env=env, stdout=files[i][0], stderr=files[i][1])
            for i in range(nproc)
        ]
        try:
            for i, p in enumerate(procs):
                rc = p.wait(timeout=timeout)
                files[i][1].flush(); files[i][1].seek(0)
                assert rc == 0, (i, files[i][1].read()[-2000:])
            files[0][0].flush(); files[0][0].seek(0)
            out = files[0][0].read()
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for fo, fe in files:
                fo.close(); fe.close()
    rows = [json.loads(line) for line in out.splitlines()
            if line.startswith("{")]
    assert rows, f"worker 0 printed no JSON: {out!r}"
    return rows[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-proc", type=int, default=16)
    ap.add_argument("--T", type=int, default=30)
    ap.add_argument("--max-iter", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--max-processes", type=int, default=4)
    args = ap.parse_args()

    base = None
    for nproc in (1, 2, 4, 8):
        if nproc > args.max_processes:
            break
        row = run_cluster(nproc, args.batch_per_proc, args.T, args.max_iter,
                          args.repeats)
        rate = row["solves_per_s"]
        if base is None:
            base = rate / nproc
        row["efficiency_vs_1proc"] = round(rate / (base * nproc), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
