"""Persistent XLA compilation cache.

Bucketed static shapes mean a handful of distinct compiles per run; caching
them on disk makes every run after the first start instantly (~10-40 s per
shape otherwise).  Controlled by BIST_XLA_CACHE (set to '0' to disable, or a
directory path to relocate; default ~/.cache/bist_tpu/xla).

A user's own JAX cache configuration wins: when jax_compilation_cache_dir is
already set (JAX_COMPILATION_CACHE_DIR env var, or jax.config.update before
any entry point runs) and BIST_XLA_CACHE doesn't name an explicit directory,
this helper leaves both the cache dir and the min-compile-time threshold
untouched."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    loc = os.environ.get("BIST_XLA_CACHE", "")
    if loc == "0":
        return
    try:
        import jax

        if not loc:
            # default-path mode: defer to any pre-existing configuration
            # (JAX_COMPILATION_CACHE_DIR or an earlier config.update — ours
            # or the user's) instead of clobbering it
            if getattr(jax.config, "jax_compilation_cache_dir", None):
                return
            loc = os.path.join(os.path.expanduser("~"), ".cache",
                               "bist_tpu", "xla")
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — run uncached
