"""Per-phase timing instrumentation.

The reference scatters ``perf_counter`` spans through every layer (assembly
lib/Assembler.py:67,221, PC setup lib/Preconditioner.py:121,139, PC apply
counters t_solid/t_fluid/t_press/t_alloc/t_total lib/Preconditioner.py:34-39,
solver total lib/Solver.py:62,150-152).  This module centralizes that:
named cumulative counters plus context-manager spans.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

from .printing import parprint


class Timers:
    """Named cumulative wall-clock counters."""

    def __init__(self):
        self._acc = defaultdict(float)
        self._count = defaultdict(int)

    @contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._acc[name] += dt
            self._count[name] += 1

    def add(self, name: str, seconds: float):
        self._acc[name] += seconds
        self._count[name] += 1

    def get(self, name: str) -> float:
        return self._acc[name]

    def count(self, name: str) -> int:
        return self._count[name]

    def asdict(self) -> dict:
        return dict(self._acc)

    def report(self, title: str = "Timings"):
        parprint(f"\n===== {title}")
        for name in sorted(self._acc):
            parprint(
                "\t{:<28s} {:9.3f}s  (x{})".format(
                    name, self._acc[name], self._count[name]
                )
            )
