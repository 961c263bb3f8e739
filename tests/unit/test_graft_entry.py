"""Regression tests for the driver hooks (__graft_entry__)."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft


def test_entry_compiles_and_prices():
    fn, args = graft.entry()
    price = float(jax.jit(fn)(*args))
    assert 5.0 < price < 20.0  # sane ATM Heston call price


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_dryrun_multichip_driver_invocation():
    """Reproduce the driver's environment: a bare process that sees ONE device
    and no conftest-injected XLA_FLAGS.  dryrun_multichip must self-bootstrap a
    virtual CPU mesh in a subprocess (MULTICHIP_r01.json regression)."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS", "_HH_DRYRUN_CHILD")
    }
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device, like the driver's 1 TPU chip
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [
            "python",
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ok on virtual 8-device CPU mesh" in proc.stdout
