"""Observability: per-phase timers, throughput counters, profiler hooks.

The reference has no tracing/profiling (SURVEY §5); here every run can report
where time went (ingest / coordinate generation / tile scatter / device) and
the snippets/sec it achieved, and can wrap the device phase in the JAX
profiler."""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("coolpuppy_tpu")


class PhaseTimers:
    def __init__(self):
        self.seconds = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = time.time()

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.seconds[name] += time.time() - t0

    def count(self, name, n=1):
        self.counts[name] += n

    def summary(self):
        total = time.time() - self._t0
        parts = ", ".join(
            f"{k}={v:.2f}s" for k, v in sorted(self.seconds.items())
        )
        snips = self.counts.get("snips", 0)
        rate = snips / total if total > 0 else 0.0
        return (
            f"wall={total:.2f}s [{parts}] snips={snips} "
            f"({rate:,.0f} snips/s)"
        )

    def log_summary(self, level=logging.INFO):
        logger.log(level, self.summary())


@contextlib.contextmanager
def device_trace(trace_dir=None):
    """Wrap a block in the JAX profiler when trace_dir is given."""
    if trace_dir:
        import jax

        with jax.profiler.trace(str(trace_dir)):
            yield
    else:
        yield
