"""Test configuration: force an 8-device CPU backend.

Tests run on a virtual 8-device CPU mesh (the standard JAX fake-backend trick)
so sharding/data-parallel paths are exercised without TPU hardware. The axon
sitecustomize pins JAX_PLATFORMS=axon, so we override via jax.config before
any backend is touched.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
