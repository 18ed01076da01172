"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Kernel tests run the Pallas kernel in interpret mode on CPU; sharding tests
use the 8 virtual devices (`--xla_force_host_platform_device_count`), per
SURVEY.md §4.

Environments that preload a TPU PJRT plugin at interpreter startup (a
sitecustomize that imports jax) make env-var switches ineffective by the time
conftest runs, so we must also override via jax.config before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) >= 8, (
    f"tests require 8 virtual CPU devices, got {jax.devices()}"
)
