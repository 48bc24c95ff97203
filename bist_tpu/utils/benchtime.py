"""Chain-difference benchmark helpers for tunnelled / remote accelerators.

On this class of harness, `block_until_ready()` can return before the device
finishes (only a host fetch syncs), so wall-timing single dispatches lies.
The sound recipe (BENCH.md methodology notes):

  1. chain the op N times inside ONE jit program reduced to a host-fetched
     scalar, and difference a 2N-chain against an N-chain — fixed
     dispatch/fetch overhead cancels;
  2. consecutive chain iterations MUST be data-dependent: a scan body that
     recomputes the same pure function of loop-invariant inputs is CSE'd by
     XLA into a single call (measured: a beam-search "chain" timed an
     impossible 65k resp/s until fixed).  `unprovable_zero` provides a
     dependence token that is always 0 but cannot be proven 0 at compile
     time.

Used by scripts/bench_{train,pack_ab,breakdown}.py; reusable for
benchmarking this framework on other hardware.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import jax.numpy as jnp


def unprovable_zero(c: jnp.ndarray) -> jnp.ndarray:
    """int32 0 derived from a traced value: threads data-dependence through
    chain iterations without changing the computation (c is never NaN)."""
    return jnp.where(jnp.isnan(c), 1, 0).astype(jnp.int32)


def timeit_median(call: Callable[[], object], reps: int = 5) -> float:
    """Median wall-time of `call` (which must host-fetch its result)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        call()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def chain_diff_ms(run_chain: Callable[[int], object], n_it: int,
                  reps: int = 5) -> float:
    """Per-iteration milliseconds via the (2n − n)-chain difference.

    run_chain(n) must execute an n-iteration chain and host-fetch the
    result (e.g. `lambda n: float(chain(args, n=n))`).  Callers should have
    warmed both chain lengths (compile) before calling."""
    t1 = timeit_median(lambda: run_chain(n_it), reps)
    t2 = timeit_median(lambda: run_chain(2 * n_it), reps)
    return max(t2 - t1, 0.0) / n_it * 1e3
