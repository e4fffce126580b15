"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY §4's test strategy for the
rebuild). Must set env vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu"; tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
