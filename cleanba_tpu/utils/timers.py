"""Wall-clock segment timers for the rollout/learner hot loops.

The reference hand-threads ~10 timing accumulators through `rollout()`
(cleanba_ppo.py:281-305, 312-323, 374-394); here they are one small object with
the same `stats/*` tag names so dashboards line up.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

__all__ = ["SegmentTimers"]


class SegmentTimers:
    """Accumulates named wall-clock segments; emit + reset once per iteration."""

    def __init__(self) -> None:
        self._acc: Dict[str, float] = defaultdict(float)

    @contextmanager
    def track(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self._acc[name] += time.time() - t0

    def add(self, name: str, seconds: float) -> None:
        self._acc[name] += seconds

    def pop_all(self) -> Dict[str, float]:
        out = dict(self._acc)
        self._acc.clear()
        return out

    def write(self, writer, step: int, prefix: str = "stats/") -> None:
        for name, seconds in self.pop_all().items():
            writer.add_scalar(prefix + name, seconds, step)
