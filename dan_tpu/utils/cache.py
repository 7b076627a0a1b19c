"""Persistent XLA compilation cache.

First compile of the 640x640 detector graph takes minutes on this setup
(remote axon compile); the persistent cache makes every later process hit
disk instead.  Called by all CLI entry points, bench.py and
__graft_entry__.py.

The cache dir is keyed on a host-machine fingerprint: XLA:CPU entries are
AOT machine code compiled with the compiling host's CPU features, and
loading them on a different host image emits machine-feature-mismatch
errors and risks SIGILL (observed in BENCH_r03.json's tail after a host
image change).  A new host image therefore gets a fresh subdirectory —
one-time recompile cost, never a cross-machine AOT load.
"""
from __future__ import annotations

import hashlib
import os


def _machine_fingerprint() -> str:
    """Stable-per-host-image key: arch + CPU feature flags."""
    key = os.uname().machine
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key += "|" + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    base = cache_dir or os.environ.get(
        "DAN_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/dan_tpu_xla")
    )
    cache_dir = os.path.join(base, f"m_{_machine_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
