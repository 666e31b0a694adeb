"""Persistent XLA compilation cache.

Compiles through this environment's remote-TPU tunnel take minutes; the JAX
persistent cache stores the serialized executable on disk, making repeat
compiles (across processes) ~instant. Enabled by every entry point
(bench.py, __graft_entry__, trainers); cache lives in <repo>/.jax_cache by
default (override with EI_NEXUS_JAX_CACHE).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax
    cache = path or os.environ.get(
        "EI_NEXUS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache
