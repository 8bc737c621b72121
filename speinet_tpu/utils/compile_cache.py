"""Persistent XLA compilation cache.

720p compiles of the full model take ~10-20 min through the remote-compile
tunnel; caching compiled executables on disk makes every later process
start instantly. Called by bench.py, main_train, infer, and __graft_entry__.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "SPEINET_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
