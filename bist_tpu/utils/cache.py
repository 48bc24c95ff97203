"""Persistent XLA compilation cache.

Bucketed static shapes mean a handful of distinct compiles per run; caching
them on disk makes every run after the first start instantly (~10-40 s per
shape otherwise).  Controlled by BIST_XLA_CACHE (set to '0' to disable, or a
directory path to relocate; default ~/.cache/bist_tpu/xla)."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    loc = os.environ.get("BIST_XLA_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache", "bist_tpu", "xla")
    try:
        os.makedirs(loc, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — run uncached
