import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware. The axon TPU plugin in this image ignores
# the JAX_PLATFORMS env var, so the platform must be forced via jax.config
# BEFORE any backend initialization (conftest imports run first).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
