"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

This is the TPU-native answer to "multi-node testing without a cluster"
(SURVEY.md section 4c): all sharding/collective tests run against
xla_force_host_platform_device_count=8.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook may have imported jax already (latching the platform
# from the environment) -- force CPU again post-import. Backends initialise
# lazily, so this is effective as long as no computation ran yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
