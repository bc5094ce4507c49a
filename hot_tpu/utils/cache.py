"""Persistent XLA compilation cache setup.

The full implicit-MPM step is a large XLA program (nested Newton/CG
while-loops over scatter/gather/SVD subgraphs); first TPU compilation runs
minutes. A persistent cache makes every later process start near-instant.
Call once, early. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("HOT_TPU_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
