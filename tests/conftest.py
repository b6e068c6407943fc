import os

# Tests run on CPU with a virtual 8-device mesh so no TPU is needed and
# sharding tests can exercise real multi-device paths.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); the config
# override below beats it, the env-var setdefault would not.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
