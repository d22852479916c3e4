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

    path = path or os.environ.get("DDPM_TPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
