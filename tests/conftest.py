"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip TPU hardware is not available in CI, so sharding tests run on
XLA's host-platform virtual devices (the fake-backend strategy the
reference lacks entirely — its tests were broken and never ran, see
test/runtests.jl:4 including a nonexistent file).  float64 is enabled to
compare against the Julia reference's Float64 semantics.

In this environment the TPU ("axon") platform registers itself as the
default regardless of JAX_PLATFORMS, so tests are pinned to the CPU backend
via ``jax_default_device`` (the CPU backend is still present with
``--xla_force_host_platform_device_count=8`` virtual devices).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

_CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", _CPUS[0])


def cpu_devices():
    return _CPUS
