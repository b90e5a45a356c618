"""Tracing / profiling hooks (SURVEY.md §5: the reference has none; the
rebuild adds jax.profiler traces and per-stage pipeline timers).

- ``trace(logdir)``       context manager around jax.profiler.trace — open
  the dump with TensorBoard / xprof to see per-op TPU timelines.
- ``StageTimer``          cheap accumulating wall-clock timers for pipeline
  stages (decode ms / preprocess ms / device ms); used by the extraction
  CLI's --profile flag.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }

    def report(self) -> str:
        return " | ".join(
            f"{name}: {s['total_s']:.2f}s/{s['count']}x ({s['mean_ms']:.1f}ms)"
            for name, s in self.summary().items()
        )
