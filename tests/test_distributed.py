"""Multi-host runtime readiness tests.

Real multi-host hardware is unavailable here, so these validate the
pieces individually: ``initialize_multihost``'s explicit-argument path is
exercised in a subprocess as a real 1-process "cluster" (the code path
that calls ``jax.distributed.initialize`` with a coordinator address), and
the scaling harness (scripts/bench_scaling.py) runs end-to-end on the
virtual CPU mesh.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(cmd, env_extra=None, timeout=480):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def test_initialize_multihost_explicit_args_single_process():
    """The explicit coordinator/num_processes/process_id path through
    jax.distributed.initialize works for a 1-process cluster (what a real
    pod launcher does per host)."""

    code = """
import jax
from ilqr_tpu.parallel.distributed import initialize_multihost
initialize_multihost(coordinator_address="localhost:57629",
                     num_processes=1, process_id=0)
assert jax.process_count() == 1
assert jax.process_index() == 0
from ilqr_tpu.parallel.distributed import global_scenario_mesh, per_host_keys
mesh = global_scenario_mesh()
assert mesh.devices.size == len(jax.devices())
k0 = per_host_keys(0)
assert k0.shape == (2,) or k0.dtype.name.startswith("key")
print("MULTIHOST_OK")
"""
    r = _run([sys.executable, "-c", code], env_extra={"JAX_PLATFORMS": "cpu"})
    assert "MULTIHOST_OK" in r.stdout, (r.stdout, r.stderr)


def test_initialize_multihost_num_processes_one_is_noop():
    from ilqr_tpu.parallel.distributed import initialize_multihost

    # Must not raise and must not try to reach a coordinator.
    initialize_multihost(coordinator_address="nowhere:1", num_processes=1)


def test_scaling_bench_runs_on_virtual_mesh():
    """scripts/bench_scaling.py end-to-end on 4 virtual CPU devices: valid
    JSON rows, sane efficiency numbers, all scenarios converged."""

    r = _run([sys.executable, "scripts/bench_scaling.py", "--platform", "cpu",
              "--devices", "4", "--batch-per-device", "8", "--T", "20",
              "--max-iter", "12"])
    assert r.returncode == 0, (r.stdout, r.stderr)
    rows = [json.loads(line) for line in r.stdout.strip().splitlines()
            if line.startswith("{")]
    assert [row["devices"] for row in rows] == [1, 2, 4]
    for row in rows:
        assert row["solves_per_s"] > 0
        assert 0 < row["efficiency_vs_1dev"]
        assert row["batch"] == 8 * row["devices"]
    # On the (serial) host platform efficiency is not meaningful, but the
    # harness contract is: row 1 defines the baseline == 1.0.
    assert rows[0]["efficiency_vs_1dev"] == pytest.approx(1.0)


def test_two_process_sharded_solve():
    """A REAL 2-process jax.distributed cluster over localhost: both
    processes build the global CPU mesh and run ``sharded_batch_solve``
    end-to-end — the per-shard solves run locally and the psum-reduced
    metrics cross processes over Gloo, so both must report identical
    converged counts and mean cost (round-2 review: the multi-host path
    had never executed with more than one process)."""

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    import tempfile

    env = dict(os.environ)
    # conftest's virtual-device XLA_FLAGS would give each process 8 local
    # CPU devices; the workers expect exactly one per process.
    env.pop("XLA_FLAGS", None)
    outs = []
    # File-redirected output: draining one worker's PIPE while the other
    # fills its 64 KB buffer deadlocks the pair mid-collective.
    with tempfile.TemporaryDirectory() as td:
        files = [(open(os.path.join(td, f"out{i}"), "w+"),
                  open(os.path.join(td, f"err{i}"), "w+")) for i in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join("tests", "_mp_solve_worker.py"),
                 str(i), "2", str(port)],
                cwd=REPO, env=env, stdout=files[i][0], stderr=files[i][1])
            for i in range(2)
        ]
        try:
            for i, p in enumerate(procs):
                try:
                    rc = p.wait(timeout=420)
                except subprocess.TimeoutExpired:
                    tails = []
                    for j, (fo, fe) in enumerate(files):
                        fo.flush(); fe.flush()
                        fo.seek(0); fe.seek(0)
                        tails.append(
                            f"--- worker {j} stdout:\n{fo.read()}\n"
                            f"--- worker {j} stderr tail:\n{fe.read()[-1500:]}")
                    raise AssertionError(
                        "worker timed out; partial output:\n"
                        + "\n".join(tails))
                files[i][0].seek(0)
                files[i][1].seek(0)
                out, err = files[i][0].read(), files[i][1].read()
                assert rc == 0, (out, err[-2000:])
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for fo, fe in files:
                fo.close()
                fe.close()

    lines = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("proc "))
    assert len(lines) == 2, outs
    # Same metrics on both processes (the psum crossed process boundaries).
    assert lines[0].split(":", 1)[1] == lines[1].split(":", 1)[1], lines
    assert "n_converged=8" in lines[0], lines


def test_initialize_multihost_bad_coordinator_fails_loudly():
    """A misconfigured cluster (coordinator that never completes) with
    num_processes > 1 must fail LOUDLY — either a raised exception or the
    JAX coordination client's fatal abort — never a silent fall-through to
    single-process work (round-2 review: silently degrading ran 1/N of the
    work and 'succeeded')."""

    code = """
from ilqr_tpu.parallel.distributed import initialize_multihost
try:
    initialize_multihost(coordinator_address="127.0.0.1:1",
                         num_processes=2, process_id=0,
                         initialization_timeout=2)
except Exception as e:
    print("RAISED_OK", type(e).__name__)
    raise SystemExit(3)
else:
    print("DID_NOT_RAISE")
"""
    r = _run([sys.executable, "-c", code], env_extra={"JAX_PLATFORMS": "cpu"},
             timeout=240)
    # jax's coordination client LOG(FATAL)s on registration timeout, so the
    # subprocess dies nonzero; a python-level exception (exit 3) also counts.
    assert r.returncode != 0, (r.returncode, r.stdout, r.stderr)
    assert "DID_NOT_RAISE" not in r.stdout, (r.stdout, r.stderr)
