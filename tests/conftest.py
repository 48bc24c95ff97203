import os

# Force CPU with 8 virtual devices: tests must not depend on TPU availability,
# and the multi-device tests need a mesh to shard over.  NOTE: this image's
# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# env vars are too late — use jax.config.update (backend not yet initialised).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The suite is XLA-compile-bound (CLAUDE.md: serial beats xdist because
# workers fight over cores during compiles).  The persistent compilation
# cache reuses executables across runs — cache keys hash the optimized HLO,
# so source changes recompile automatically and cached numerics are the
# same bits as fresh ones.  BIST_XLA_CACHE=0 disables.
from bist_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
