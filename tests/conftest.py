"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY §4's test strategy for the
rebuild). Must set env vars before jax initializes.
"""

import os

# PDM_TPU_TESTS=1 leaves the real backend in place so the backend-gated
# hardware-parity tests (skipif default_backend() != "tpu") actually run;
# everything else in the suite still passes on the chip but is slow there.
_tpu_mode = os.environ.get("PDM_TPU_TESTS") == "1"

if not _tpu_mode:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _tpu_mode:
    # The environment's sitecustomize registers the axon TPU plugin and
    # forces jax_platforms="axon,cpu"; tests run on the virtual 8-device
    # CPU mesh by default.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
