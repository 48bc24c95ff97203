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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
