"""Worker process for tests/test_multihost.py: one of two jax.distributed
CPU processes running a REAL cross-process data-parallel train step.

Usage: python multihost_worker.py <coordinator> <num_procs> <process_id>

Each process owns 1 virtual CPU device (global mesh = 2 devices across 2
processes) and feeds its local half of a deterministic global batch via
jax.make_array_from_process_local_data.  Prints `LOSS <value>` — the parent
asserts both processes agree and that the value equals a single-process run
of the same step (proving the cross-process gradient all-reduce is exact).
"""

import os
import sys

# This image's sitecustomize imports jax with JAX_PLATFORMS=axon at
# interpreter start; XLA_FLAGS must be in the env before backend init and
# the platform forced via jax.config (see tests/conftest.py).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from bist_tpu.parallel.multihost import init_multihost, local_example_slice
from bist_tpu.parallel.mesh import make_mesh
from multihost_common import GLOBAL_BATCH, make_cfgs, make_state_and_step


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    idx = init_multihost(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == num_procs
    assert jax.device_count() == num_procs  # 1 virtual CPU device per process

    mesh = make_mesh()
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))

    cfg, tcfg = make_cfgs()
    state, step_fn, batch_np, key_np = make_state_and_step(cfg, tcfg)

    # every process holds identical full params/opt state → replicated global
    def to_global(sharding, local):
        return jax.make_array_from_process_local_data(sharding, np.asarray(local))

    state = jax.tree_util.tree_map(lambda x: to_global(rep, x), state)
    # each process feeds only ITS batch rows (per-host input pipeline)
    sl = local_example_slice(GLOBAL_BATCH)
    assert sl == slice(pid * (GLOBAL_BATCH // num_procs),
                       (pid + 1) * (GLOBAL_BATCH // num_procs))
    batch = jax.tree_util.tree_map(
        lambda x: None if x is None else to_global(bsh, x[sl]), batch_np,
        is_leaf=lambda x: x is None)
    key = to_global(rep, key_np)

    state2, metrics = step_fn(state, batch, key)
    loss = float(metrics["loss"])
    # param update actually happened and is finite on every process
    delta = float(jnp.abs(state2.params["embed"]["lut"] - state.params["embed"]["lut"]).max())
    assert np.isfinite(loss) and delta > 0.0
    print(f"LOSS {loss:.8f} DELTA {delta:.8e}", flush=True)


if __name__ == "__main__":
    main()
