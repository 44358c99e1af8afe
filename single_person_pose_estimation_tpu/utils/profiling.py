"""Profiling & tracing utilities.

The reference's only instrumentation is wall-clock prints around fit
(trainer.py:48,57) — SURVEY.md §5 calls for real tracing in the rebuild:
jax.profiler traces (viewable in TensorBoard/Perfetto), named trace
annotations on pipeline stages, and a step-time/images-per-sec meter
(the trainer already streams those to metrics.jsonl).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace into `log_dir` (TensorBoard 'profile' plugin
    or Perfetto). Usage:

        with profiling.trace("/tmp/trace"):
            state, m = train_step(state, batch)
            jax.block_until_ready(m["loss"])
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces
    (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time / throughput meter.

    Call `tick(n_items)` once per step; read `.summary()` for
    {mean_step_s, p50, p90, items_per_sec} over the window (first step —
    compile — is excluded).
    """

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []
        self._items = []
        self._last: Optional[float] = None
        self._seen_first = False

    def tick(self, n_items: int = 0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            if self._seen_first:
                self._times.append(now - self._last)
                self._items.append(n_items)
                if len(self._times) > self.window:
                    self._times.pop(0)
                    self._items.pop(0)
            else:
                self._seen_first = True  # drop the compile step
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        total_t = sum(self._times)
        return {
            "mean_step_s": total_t / len(ts),
            "p50_step_s": ts[len(ts) // 2],
            "p90_step_s": ts[int(len(ts) * 0.9)],
            "items_per_sec": (sum(self._items) / total_t) if total_t else 0.0,
        }
