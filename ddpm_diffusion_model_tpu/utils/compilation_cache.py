"""Persistent XLA compilation cache.

First compile of the 31M-param train step through the TPU toolchain is slow
(tens of seconds to minutes); the cache makes every subsequent process reuse
it.  Called by the CLI, bench, and graft entry points.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "ddpm_tpu_jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    env = os.environ.get("DDPM_TPU_CACHE_DIR")
    if env == "off":
        # the pytest suite sets this (tests/conftest.py): CLI e2e tests call
        # main() in-process, which would otherwise flip the GLOBAL jax config
        # to a persistent cache for the rest of the suite.
        return ""
    if os.environ.get("PALLAS_AXON_POOL_IPS") and jax.default_backend() == "tpu":
        # tunneled TPU plugin: persistent-cache WRITES work, but a cache-hit
        # READ (executable deserialization over the relay) hangs forever and
        # blocks the serialized tunnel for every process behind it —
        # bisected on this host with an A/B of the same unique program
        # (write-run returns in seconds, identical read-run never returns).
        # Recompiling every run is slow but terminates.
        print("[CACHE] tunneled TPU plugin: persistent compilation cache "
              "disabled (cache-hit reads hang over the relay)")
        return ""
    path = path or env or _DEFAULT
    # Per-backend subdir: the CPU-mesh test suite (CLI e2e tests enable the
    # cache in-process) and real-TPU runs must never share cache FILES —
    # a killed writer leaves a truncated entry, and a concurrent or later
    # reader of that file segfaults inside zstd (observed on this host).
    # Entry keys already include the platform, so this only separates the
    # directories, it does not change what hits.
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
