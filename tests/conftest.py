"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware.

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) at the env
level, so the env var alone is not enough — jax.config.update after import is
what actually switches the backend. Matmul precision is raised to 'highest'
so float32 parity tests are not subject to MXU bf16 defaults.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
