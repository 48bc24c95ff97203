"""Multi-host (DCN) initialisation.

The reference is single-host only (SURVEY §2.4); this is the optional
multi-host entry: call `init_multihost()` once per process before any jax
use on a multi-host TPU slice (GCE metadata autodetects the coordinator on
Cloud TPU).  After it, `parallel.mesh.make_mesh()` spans all hosts' devices
and the data-parallel train step scales unchanged — each host feeds its own
batch shard (AVSDLoader with `pad_batch_multiple = global mesh size` and a
per-host slice of the examples)."""

from __future__ import annotations

from typing import Optional


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """jax.distributed.initialize wrapper; returns this process's index.
    No-op (returns 0) in single-process settings."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return 0
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # Tolerate ONLY double-initialisation (idempotent callers); any other
        # failure (unreachable coordinator, mismatched process counts, ...)
        # must surface — swallowing it would silently fall back to
        # single-host training.
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index()


def local_example_slice(n_examples: int) -> slice:
    """The contiguous slice of a dataset this host should load (per-host
    sharded input pipeline)."""
    import jax

    per = (n_examples + jax.process_count() - 1) // jax.process_count()
    start = jax.process_index() * per
    return slice(start, min(start + per, n_examples))