"""One-stop JAX runtime setup: persistent compilation cache (remote TPU
compiles run 100-260 s uncached on this environment) and friendly defaults."""

from __future__ import annotations

import os

_done = False


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache = path or os.environ.get("DPQ_JAX_CACHE", "/tmp/jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement
