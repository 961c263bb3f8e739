"""Test harness config: run everything on CPU with 8 virtual devices.

Mirrors the reference's single-suite strategy (test/runtests.jl) but adds the
TPU-specific tier from SURVEY.md §4: multi-chip sharding logic is validated on
a virtual 8-device CPU mesh (`--xla_force_host_platform_device_count=8`), the
standard stand-in for a real slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
