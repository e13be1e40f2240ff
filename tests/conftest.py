import os
import sys

# Multi-chip sharding tests run on a virtual 8-device CPU mesh.  The
# environment pins jax_platforms to the axon TPU plugin regardless of
# JAX_PLATFORMS, so force CPU through the config API as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
