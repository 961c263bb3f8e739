"""Guard: the suite must run on CPU with the 8-device virtual mesh even when
launched from this machine's default environment (JAX_PLATFORMS=axon with a
sitecustomize that imports jax before conftest runs)."""

import jax


def test_suite_runs_on_virtual_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
