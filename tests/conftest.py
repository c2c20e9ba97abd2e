"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the session env pins JAX_PLATFORMS=axon — override it
unconditionally), and use full-precision matmuls so numeric goldens are
meaningful."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
