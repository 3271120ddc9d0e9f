"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding (mesh/pjit/shard_map) is exercised without TPU hardware.

The session env pins JAX_PLATFORMS=axon (the real-chip tunnel) and the
jaxtyping pytest plugin imports jax before conftests load, so setting the
env var alone is not enough — we also flip the live jax config (backends
are not initialized yet at conftest time)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
