"""Test configuration: force CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware."""

import os

# Force CPU even when the shell pre-sets another platform (e.g. a tunneled
# TPU): unit tests need fp32 numerics and a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may register an external TPU PJRT plugin at interpreter
# start (sitecustomize) that overrides JAX_PLATFORMS; force CPU explicitly so
# unit tests never compile over a device tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is compile-bound on this 1-core host;
# caching compiled programs across runs cuts repeat wall time substantially.
# Keyed by host CPU features (utils.helpers.host_cache_dir): XLA:CPU AOT
# results compiled on a different machine generation load with "could lead
# to SIGILL" warnings when /tmp survives a host change.
from mobileposer_tpu.utils.helpers import host_cache_dir  # noqa: E402

_cache = host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
