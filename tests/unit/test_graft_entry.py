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


def test_dryrun_backend_probe_failure_falls_back_to_bootstrap(monkeypatch):
    """MULTICHIP_r03 regression: ``jax.devices()`` raising at backend init in
    the parent (libtpu client/terminal version mismatch) must NOT kill the
    dryrun — it must take the CPU-subprocess bootstrap path.  The subprocess
    itself is stubbed out so this stays a fast unit test; the end-to-end
    bootstrap is covered by test_dryrun_multichip_driver_invocation."""
    import subprocess

    def boom():
        raise RuntimeError(
            "FAILED_PRECONDITION: libtpu version mismatch (simulated)"
        )

    calls = {}

    def fake_run(cmd, **kwargs):
        calls["env"] = kwargs["env"]
        calls["cmd"] = cmd
        return subprocess.CompletedProcess(
            cmd, 0, stdout="DRYRUN_MULTICHIP_OK\n", stderr=""
        )

    monkeypatch.setattr(jax, "devices", boom)
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must not raise
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["env"]["_HH_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]


def test_dryrun_local_impl_failure_falls_back_to_bootstrap(monkeypatch):
    """A flaky accelerator runtime can also die *inside* the local run (enough
    devices visible, then a runtime error mid-step).  The parent must retry on
    the virtual CPU mesh rather than propagate."""
    import subprocess

    monkeypatch.setattr(jax, "devices", lambda *a: list(range(8)))
    monkeypatch.setattr(
        graft,
        "_dryrun_multichip_impl",
        lambda n: (_ for _ in ()).throw(RuntimeError("DEADLINE_EXCEEDED (simulated)")),
    )
    calls = {}

    def fake_run(cmd, **kwargs):
        calls["env"] = kwargs["env"]
        return subprocess.CompletedProcess(cmd, 0, stdout="DRYRUN_MULTICHIP_OK\n", stderr="")

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must not raise
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


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
