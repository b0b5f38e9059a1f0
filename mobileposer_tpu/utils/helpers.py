"""Small shared helpers.

`getenv_flag` reproduces the reference's `helpers.getenv` semantics
(helpers.py:4): numeric strings are int-cast, so ONLINE=0 / PHYSICS=0
disable the feature — `bool(os.environ.get(...))` would treat "0" as on.
"""

from __future__ import annotations

import os


def host_cache_dir(prefix: str = "/tmp/jax_cache") -> str:
    """Per-host-CPU-generation JAX compile-cache directory.

    XLA:CPU AOT cache entries compiled on a different machine generation
    load with "could lead to SIGILL" warnings when /tmp outlives a host
    change; keying the directory by the host's cpuinfo feature flags keeps
    each generation's cache separate. Single implementation shared by
    tests/conftest.py and __graft_entry__.py."""
    import hashlib
    import platform

    tag = hashlib.sha1((platform.machine()
                        + platform.processor()).encode()).hexdigest()[:10]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 reports "flags", aarch64 "Features"
                if line.startswith(("flags", "Features")):
                    tag = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    return f"{prefix}_{tag}"


def enable_persistent_compile_cache() -> str:
    """Wire up the host-keyed persistent JAX compile cache (benchmarks and
    driver entry points are compile-bound over the tunnel; repeat runs hit
    the cache). Returns the directory used."""
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", host_cache_dir())
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache


def getenv_flag(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None or v == "":
        return default
    try:
        return bool(int(v))
    except ValueError:
        return True
