import os

# Tests run on a virtual 8-device CPU mesh: deterministic, fast, and lets the
# multi-chip sharding paths compile+execute without TPU hardware.
#
# The ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize registers that backend in every interpreter, so the env var
# alone is not enough — override through jax.config before any backend
# initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
