"""Per-stage timing + optional JAX device profiling.

First-class observability the reference lacks (SURVEY.md §5: its only
instrumentation is wall-clock ``compute_time`` fields).  ``StageTimer``
accumulates named host-side stage durations; ``device_trace`` wraps
``jax.profiler`` so a run can emit a TensorBoard-compatible trace with
``M6ANET_TPU_TRACE_DIR=/path`` set.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        parts = [
            f"{name}={self.totals[name]:.2f}s/{self.counts[name]}x"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return " ".join(parts)


@contextlib.contextmanager
def device_trace() -> Iterator[None]:
    """Emit a jax.profiler trace when M6ANET_TPU_TRACE_DIR is set."""
    trace_dir = os.environ.get("M6ANET_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
