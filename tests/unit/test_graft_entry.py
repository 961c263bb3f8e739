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


def _fake_run_factory(calls, *, probe_stdout, probe_rc=0):
    """A subprocess.run stub that answers the health probe with the given
    outcome and records the bootstrap call's env.  The two call sites are
    distinguished by their payload: the probe runs ``-c`` code containing
    HEALTH_OK; the bootstrap passes env with _HH_DRYRUN_CHILD=1."""
    import subprocess

    def fake_run(cmd, **kwargs):
        code = cmd[-1] if isinstance(cmd, (list, tuple)) else str(cmd)
        if "HEALTH_OK" in code:
            calls["probed"] = True
            return subprocess.CompletedProcess(
                cmd, probe_rc, stdout=probe_stdout, stderr=""
            )
        calls["env"] = kwargs["env"]
        calls["cmd"] = cmd
        return subprocess.CompletedProcess(
            cmd, 0, stdout="DRYRUN_MULTICHIP_OK\n", stderr=""
        )

    return fake_run


def test_dryrun_backend_probe_failure_falls_back_to_bootstrap(monkeypatch):
    """MULTICHIP_r03/r04 regression: a broken accelerator runtime (libtpu
    client/terminal version mismatch) must NOT kill the dryrun.  Backend
    health is now probed in a subprocess; when that probe fails the parent
    must take the CPU-subprocess bootstrap path without ever initializing the
    backend in-process.  Subprocesses are stubbed so this stays a fast unit
    test; the end-to-end bootstrap is covered by
    test_dryrun_multichip_driver_invocation and
    test_broken_platform_import_and_dryrun_bootstrap."""
    calls = {}
    fake_run = _fake_run_factory(
        calls,
        probe_rc=1,
        probe_stdout="",  # probe subprocess died at backend init
    )
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must not raise
    assert calls["probed"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["env"]["_HH_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in calls["env"]["XLA_FLAGS"]


def test_dryrun_probe_timeout_falls_back_to_bootstrap(monkeypatch):
    """VERDICT r4 weak #6: a backend whose init *stalls* (relay registration
    measured occasionally minutes-long) used to burn the whole contract
    timeout inside the local 4-phase run.  The subprocess health probe is
    killed at its own short timeout and the parent must bootstrap instead."""
    import subprocess

    calls = {}

    def fake_run(cmd, **kwargs):
        code = cmd[-1] if isinstance(cmd, (list, tuple)) else str(cmd)
        if "HEALTH_OK" in code:
            raise subprocess.TimeoutExpired(cmd, kwargs.get("timeout", 120))
        calls["env"] = kwargs["env"]
        return subprocess.CompletedProcess(
            cmd, 0, stdout="DRYRUN_MULTICHIP_OK\n", stderr=""
        )

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must not raise
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_dryrun_local_impl_failure_falls_back_to_bootstrap(monkeypatch):
    """A flaky accelerator runtime can also die *inside* the local run (probe
    healthy, then a runtime error mid-step).  The parent must retry on the
    virtual CPU mesh rather than propagate."""
    calls = {}
    fake_run = _fake_run_factory(calls, probe_stdout="HEALTH_OK 8\n")
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    monkeypatch.setattr(
        graft,
        "_dryrun_multichip_impl",
        lambda n: (_ for _ in ()).throw(RuntimeError("DEADLINE_EXCEEDED (simulated)")),
    )
    graft.dryrun_multichip(8)  # must not raise
    assert calls["probed"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_dryrun_healthy_probe_runs_locally(monkeypatch):
    """When the probe reports enough healthy devices the 4-phase impl runs
    in-process and no bootstrap subprocess is spawned."""
    calls = {}
    ran = {}
    fake_run = _fake_run_factory(calls, probe_stdout="HEALTH_OK 8\n")
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    monkeypatch.setattr(
        graft, "_dryrun_multichip_impl", lambda n: ran.setdefault("n", n)
    )
    graft.dryrun_multichip(8)
    assert ran["n"] == 8
    assert "env" not in calls  # no bootstrap


def test_import_is_computation_free():
    """MULTICHIP_r04 root-cause regression: module-scope ``jnp.array`` calls
    (market/svi.py, math/bvn.py pre-r5) executed ``convert_element_type`` on
    the default backend at ``import hedgehog_tpu``, so a broken accelerator
    runtime killed the import before any dryrun guard could run.  Poison
    eager primitive dispatch in a fresh subprocess and assert the import (and
    the driver module's import) still succeeds."""
    import os
    import subprocess

    code = (
        "import jax\n"
        "from jax._src import dispatch\n"
        "def _poison(*a, **k):\n"
        "    raise RuntimeError('eager primitive execution at import time')\n"
        "dispatch.apply_primitive = _poison\n"
        "import hedgehog_tpu\n"
        "import __graft_entry__\n"
        "print('IMPORT_OK')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        ["python", "-c", code], env=env, capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "IMPORT_OK" in proc.stdout


def test_broken_platform_import_and_dryrun_bootstrap():
    """End-to-end MULTICHIP_r04 simulation: a parent process whose ONLY
    platform fails backend init (JAX_PLATFORMS=cuda on a host with no GPU
    runtime) must still (a) import hedgehog_tpu, because the import is
    computation-free, and (b) complete dryrun_multichip by bootstrapping to
    the virtual CPU mesh — the health probe inherits the broken platform and
    reports unhealthy, the bootstrap child pins JAX_PLATFORMS=cpu."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "PALLAS_AXON_POOL_IPS", "_HH_DRYRUN_CHILD")
    }
    env["JAX_PLATFORMS"] = "cuda"  # backend init raises: no GPU runtime here
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [
            "python",
            "-c",
            "import hedgehog_tpu; print('IMPORT_OK'); "
            "import __graft_entry__ as g; g.dryrun_multichip(4)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "IMPORT_OK" in proc.stdout
    assert "ok on virtual 4-device CPU mesh" in proc.stdout


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
