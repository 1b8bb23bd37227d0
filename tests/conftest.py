"""Tests run on the CPU backend with 8 virtual devices so sharding logic is
exercised without TPU hardware (multi-chip is validated separately by the
driver via __graft_entry__.dryrun_multichip).

The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (TPU
tunnel), so env vars alone are read too late — jax.config.update still works
because no backend has been initialized when conftest loads.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: takes >30s on the CPU backend (deselect with -m 'not slow')",
    )
