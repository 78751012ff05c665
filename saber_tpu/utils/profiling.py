"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5: only wall-clock task records in
GPUPool); this is a first-class component here:

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace (op-level TPU timeline).
- ``annotate(name)``: ``TraceAnnotation`` scope so pipeline stages (encode/
  seed/propagate/paint) show up as named spans in the trace.
- ``StageTimer``: lightweight wall-clock stage aggregation with device
  synchronization, for quick CLI-level reporting without a trace viewer.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/saber_tpu_trace"):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for profiler timelines (no-op cost when not tracing)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Aggregate wall-clock per pipeline stage, synchronizing the device so
    async dispatch doesn't misattribute time."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    (jax.device_put(0.0) + 0).block_until_ready()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"  {name:<24} {t:8.3f}s total  {t / c:8.4f}s/call  ×{c}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "calls": self.counts[k]}
                for k in self.totals}
