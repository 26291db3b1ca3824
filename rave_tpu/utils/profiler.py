"""Profiling: tick-style section profiler + jax.profiler traces.

Counterpart of the reference's hand-rolled ``Profiler``
(``rave/model.py:32-47``) and Lightning's ``profiler="simple"``
(``scripts/train.py:214``).  ``Sections`` times host-side regions with
explicit device syncs; ``trace`` wraps ``jax.profiler`` for on-device
timelines viewable in TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Sections:
    def __init__(self, sync: bool = True):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str, *arrays):
        t0 = time.perf_counter()
        yield
        if self.sync and arrays:
            jax.block_until_ready(arrays)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def __repr__(self) -> str:
        lines = ["=" * 60]
        for k in self.totals:
            n = self.counts[k]
            lines.append(f"{k}: total {self.totals[k]*1e3:.2f}ms "
                         f"avg {self.totals[k]/max(n,1)*1e3:.2f}ms x{n}")
        lines.append("=" * 60)
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level trace: ``with trace('runs/x/profile'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
