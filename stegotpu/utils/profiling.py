"""Profiling & tracing: jax.profiler traces + lightweight stage timers.

The reference has no profiling at all — its "timing" probes are time.sleep
simulations (reference: evaluation.py:241-264). This module provides the real
thing: XLA device traces viewable in TensorBoard/Perfetto, and a cheap
wall-clock stage timer for the host pipeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/stegotpu-trace"):
    """Capture a jax.profiler trace around a block (open in TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer for named pipeline stages.

    with timer.stage("decode"): ...
    print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {n} calls, {t / n * 1e3:.2f} ms/call")
        return "\n".join(lines)


def annotate(name: str):
    """Named region visible in device traces (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
