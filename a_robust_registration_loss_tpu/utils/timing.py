"""Step timing + profiler trace hooks.

The reference has no profiling at all (SURVEY.md §5: the only timing data is
a precomputed table image); this module substantiates the >10x iters/sec
target: a blocking step timer (device-sync'd, so it measures real work, not
dispatch) and a jax.profiler trace context for deeper dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Accumulates device-synchronized step times; .summary() gives
    mean/p50/p90 over the recorded window (first ``warmup`` steps dropped —
    they contain compilation)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []

    @contextlib.contextmanager
    def step(self, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.times.append(time.perf_counter() - t0)

    def summary(self):
        ts = sorted(self.times[self.warmup:]) or sorted(self.times)
        if not ts:
            return {}
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(n * 0.9))],
            "iters_per_sec": n / sum(ts),
        }


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
