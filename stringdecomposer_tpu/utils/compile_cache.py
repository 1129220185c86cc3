"""Persistent XLA compilation cache.

Cold compiles of the fused Pallas kernels take tens of seconds to minutes;
with the persistent cache a fresh process reloads them in seconds. Enabled
once per process by the pipeline entry points."""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SDTPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "stringdecomposer_tpu", "jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    _enabled = True
