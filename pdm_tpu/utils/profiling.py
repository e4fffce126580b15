"""Profiling and tracing (SURVEY §5: absent in the reference beyond tqdm;
here a first-class subsystem).

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible device trace.
* ``PhaseTimer`` — named wall-clock phase accumulation with honest device
  sync (axon's block_until_ready is a no-op; see utils/timing.py).
* ``annotate`` — TraceAnnotation wrapper so trainer phases show up in the
  device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, Optional

import jax

from .timing import sync


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("train_step", sync_tree=metrics): ...
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_tree: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'phase':<24} {'count':>8} {'mean ms':>10} {'total s':>10}"]
        for name, row in sorted(self.summary().items()):
            lines.append(
                f"{name:<24} {row['count']:>8} {row['mean_ms']:>10.2f} "
                f"{row['total_s']:>10.2f}"
            )
        return "\n".join(lines)
