"""Profiling & step timing — first-class observability (SURVEY.md §5).

The reference has no tracing at all (tqdm bars only, training_utils.py:41).
Here: a JAX profiler context (XLA trace viewable in TensorBoard/Perfetto)
and a lightweight step timer that logs p50/p95/max step latencies through
the logging facade.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture an XLA profiler trace for the enclosed block (no-op when
    logdir is None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; reports percentile summaries."""

    def __init__(self, logger=None, prefix: str = "perf"):
        self.times: list[float] = []
        self.logger = logger
        self.prefix = prefix
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        # drop the first (compile) step from the percentiles — but if it is
        # the ONLY step, reporting it as p50 would poison the perf record
        # with a compile time; report just the count instead
        steps = {f"{self.prefix}/steps": len(self.times) - 1}
        if len(self.times) < 2:
            return steps
        t = np.asarray(self.times[1:])
        return {
            **steps,  # steps counted consistently with the percentiles
            f"{self.prefix}/step_ms_p50": float(np.percentile(t, 50) * 1e3),
            f"{self.prefix}/step_ms_p95": float(np.percentile(t, 95) * 1e3),
            f"{self.prefix}/step_ms_max": float(t.max() * 1e3),
        }

    def log_summary(self):
        if self.logger is not None and self.times:
            self.logger.log(self.summary())
        self.times.clear()
