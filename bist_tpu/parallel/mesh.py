"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's single-process `nn.DataParallel` (train.py:96-99).

Design (SURVEY.md §2.4): a 1-D mesh over all devices with the batch dimension
sharded (`P('data')`) and parameters/optimizer state replicated.  Gradient
all-reduce is emitted by XLA as ICI collectives inside the jitted train step —
there is no hand-written communication backend, matching how the reference
has none (its DataParallel is single-process CUDA peer copies).

A 2-D ('data', 'model') mesh is provided for future tensor parallelism; the
BiST workload (d_model=128) does not need TP for parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data",
              model_axis: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh (or 2-D when model_axis > 1)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    if model_axis > 1:
        assert n % model_axis == 0
        arr = np.array(devs).reshape(n // model_axis, model_axis)
        return Mesh(arr, (axis_name, "model"))
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard leading (batch) dim across the mesh; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a Batch pytree with the batch dim sharded over the mesh.

    Batch size must divide the mesh size (make_batch's pad_batch_to handles
    padding rows; padded rows carry zero tokens and no loss mass)."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


class DataParallel:
    """Convenience wrapper: holds the mesh + shardings for a training run."""

    def __init__(self, num_devices: int = 0, axis_name: str = "data"):
        self.axis_name = axis_name
        self.mesh = make_mesh(num_devices, axis_name)
        self.n = self.mesh.devices.size
        self.batch_sharding = batch_sharding(self.mesh, axis_name)
        self.replicated = replicate(self.mesh)

    def pad_batch_to(self, n_examples: int) -> int:
        """Round a batch size up to a multiple of the mesh size."""
        return ((n_examples + self.n - 1) // self.n) * self.n

    def shard(self, batch):
        return shard_batch(self.mesh, batch, self.axis_name)

    def put_replicated(self, tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.replicated), tree)
