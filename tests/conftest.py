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

# NOTE: do NOT enable the persistent compilation cache here — writing
# multi-device (shard_map) CPU executables to it aborts the process
# (XLA serialization CHECK, observed 2026-08); single-device
# measurement scripts may use JAX_COMPILATION_CACHE_DIR safely.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jax_programs():
    """Free compiled executables between test modules.

    One process accumulates every test's XLA CPU programs; past ~60
    encoder-sized programs the next multi-device compile can abort the
    interpreter (observed 2026-08: SIGABRT inside
    backend_compile_and_load with ample free RAM).  Dropping caches at
    module boundaries keeps the working set bounded.
    """
    yield
    import jax as _jax
    _jax.clear_caches()
