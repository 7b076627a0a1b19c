"""Persistent XLA compilation cache.

First compile of the 640x640 detector graph takes minutes on this setup
(remote axon compile); the persistent cache makes every later process hit
disk instead.  Called by all CLI entry points, bench.py and
__graft_entry__.py.
"""
from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DAN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/dan_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
