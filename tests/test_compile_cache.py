"""Persistent-compilation-cache helper (bist_tpu/utils/cache.py).

The cache is enabled by every entry point (train/generate/serve/extract/
bench/--graft entry) and by this suite's conftest; these tests pin the knob
semantics (BIST_XLA_CACHE=0 disables, =<dir> relocates) and that a
sufficiently expensive jit actually lands an executable on disk and is
served from it in a fresh process.  On-chip behaviour (axon backend) is
measured in BENCH.md round-4 session-9: beam program 8.96 s cold ->
1.61 s warm, cross-process.
"""

import os
import subprocess
import sys

import jax
import pytest

from bist_tpu.utils.cache import enable_compilation_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _restore(prev_dir, prev_min):
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_env_zero_disables(monkeypatch):
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("BIST_XLA_CACHE", "0")
        jax.config.update("jax_compilation_cache_dir", None)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        _restore(prev_dir, prev_min)


def test_env_relocates(monkeypatch, tmp_path):
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        loc = str(tmp_path / "xla")
        monkeypatch.setenv("BIST_XLA_CACHE", loc)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == loc
        assert os.path.isdir(loc)
    finally:
        _restore(prev_dir, prev_min)


_CHILD = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[2])
from bist_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
# drop the helper's 1s write threshold so a small test program qualifies
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

def f(a, b):
    c = a
    # enough distinct work that the cold compile is solidly above the warm
    # path's trace+lookup+deserialize cost (the timing assertion's margin)
    for i in range(24):
        c = jnp.tanh(c @ b) + a * (1.0 + i)
        c = jnp.where(c > 0, c, 0.1 * c)
    return c.sum()

a = jnp.ones((131, 67))
b = jnp.ones((67, 67))
t0 = time.time()
g = jax.jit(f).lower(a, b).compile()
print(f"compile_s={time.time() - t0:.4f}")
print(f"val={float(g(a, b)):.3f}")
"""


def test_cross_process_hit_and_identical_result(tmp_path):
    """A fresh process writes an executable; a second one reuses it and
    computes the identical value (cache keys hash the optimized HLO)."""
    env = dict(os.environ, BIST_XLA_CACHE=str(tmp_path / "xla"))
    runs = []
    for i in range(2):
        r = subprocess.run([sys.executable, "-c", _CHILD, "x", REPO],
                           env=env, capture_output=True, text=True,
                           timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        out = dict(ln.split("=", 1) for ln in r.stdout.split()
                   if "=" in ln)
        runs.append(out)
        if i == 0 and not os.listdir(str(tmp_path / "xla")):
            # enable_compilation_cache no-ops (by design) on jax builds or
            # filesystems where the persistent cache can't operate
            pytest.skip("persistent compilation cache unavailable here")
    assert runs[0]["val"] == runs[1]["val"]
    # the warm compile must beat the cold one (measured ~25x on CPU; assert
    # a loose 1.5x so load-spike noise can't flake the test)
    assert float(runs[1]["compile_s"]) < float(runs[0]["compile_s"]) / 1.5


def test_existing_jax_config_wins(monkeypatch, tmp_path):
    """Default-path mode defers to a pre-existing cache configuration (e.g.
    the user's JAX_COMPILATION_CACHE_DIR) instead of clobbering it; an
    explicit BIST_XLA_CACHE dir still overrides."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.delenv("BIST_XLA_CACHE", raising=False)
        user_loc = str(tmp_path / "user_xla")
        jax.config.update("jax_compilation_cache_dir", user_loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.25)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == user_loc
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.25
        ours = str(tmp_path / "bist_xla")
        monkeypatch.setenv("BIST_XLA_CACHE", ours)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == ours
    finally:
        _restore(prev_dir, prev_min)
