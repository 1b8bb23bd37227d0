"""Tests run on the CPU backend with 8 virtual devices so sharding logic is
exercised without TPU hardware (multi-chip is validated separately by the
driver via __graft_entry__.dryrun_multichip). JAX_PLATFORMS must be forced
(the session env presets it to the axon TPU tunnel)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
