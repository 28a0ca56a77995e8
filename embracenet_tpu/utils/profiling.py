"""Tracing / profiling hooks (SURVEY.md §5.1: absent in the reference —
only tqdm bars; here: jax.profiler traces + lightweight step timers)."""

from __future__ import annotations

import contextlib
import json
import time


class StepTimer:
    """Accumulates wall-clock per named phase; cheap enough to always run."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(self.totals[name]
                                        / self.counts[name] * 1e3, 3)}
                for name in self.totals}

    def dump(self, path: str):
        with open(path, "w") as fh:
            json.dump(self.summary(), fh, indent=1)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
