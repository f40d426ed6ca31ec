"""The driver's entry points must compile and run."""

import jax
import jax.numpy as jnp


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    xs, us, cost = jax.block_until_ready(out)
    assert xs.shape[0] == us.shape[0] + 1
    assert jnp.isfinite(cost)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    from tests.conftest import cpu_devices

    if len(cpu_devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    # Patch device discovery to the CPU backend for the in-test dry run.
    ge.dryrun_multichip(8)
