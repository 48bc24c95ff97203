"""Tracing / profiling hooks.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5:
per-turn ElapsedTime in generate.py:84, AverageMeter in the vestigial
extractor).  Here:

  * `trace_context` / `profile_to` — jax.profiler integration: capture a
    device trace viewable in TensorBoard / Perfetto;
  * `StepTimer` — step-time and throughput accounting (tokens/sec,
    responses/sec) with warmup discard, for train/generate loops;
  * `annotate` — TraceAnnotation wrapper so host phases show up in traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace_context(name: str):
    """Annotate a host-side region in the profiler timeline."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a full device profile into `logdir` (TensorBoard format)."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step-time/throughput accounting with warmup discard.

    >>> timer = StepTimer(warmup=2)
    >>> for batch in loader:
    ...     with timer.step(items=batch_size):
    ...         run(batch)
    >>> timer.summary()   # {'steps': n, 'mean_s': ..., 'items_per_s': ...}
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._items: List[int] = []
        self._n_seen = 0

    @contextlib.contextmanager
    def step(self, items: int = 1):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._n_seen += 1
        if self._n_seen > self.warmup:
            self._times.append(dt)
            self._items.append(items)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0, "mean_s": 0.0, "p50_s": 0.0, "items_per_s": 0.0}
        times = sorted(self._times)
        total_t = sum(self._times)
        return {
            "steps": len(self._times),
            "mean_s": total_t / len(self._times),
            "p50_s": times[len(times) // 2],
            "items_per_s": sum(self._items) / total_t if total_t > 0 else 0.0,
        }
