import os
import sys

# Tests run on CPU with a virtual 8-device mesh so sharding/collective
# paths compile and execute without TPU hardware (SURVEY §4). The axon
# site hook pins JAX_PLATFORMS=axon, so the platform must be forced via
# jax.config (backends initialize lazily; this runs before any jax use).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity gates compare against float32 oracles.
jax.config.update("jax_default_matmul_precision", "highest")
