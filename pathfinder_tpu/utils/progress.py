"""Progress reporting (the reference's ProgressLogging analog).

The reference emits per-iteration optimizer progress (``src/optimize.jl:
91-92``), per-try names ("Optimizing (try N)", ``src/singlepath.jl:270,279``)
and a throttled cross-task channel for multipath — at most one update per
0.1 s and per 0.5 % progress (``src/multipath.jl:164-214``). Here the units
of progress are different (a whole batched round instead of a task), but the
same throttling contract is applied; in-jit per-iteration reporting is
available via ``jax.debug.callback`` on request (off by default — host
callbacks serialize the device stream).
"""

from __future__ import annotations

import sys
import time

__all__ = ["ThrottledProgress"]


class ThrottledProgress:
    """Throttled progress printer: ≤ 1 update / ``min_seconds`` and
    / ``min_fraction`` progress (parity: ``src/multipath.jl:171-189``)."""

    def __init__(
        self,
        total: int,
        name: str = "Pathfinder",
        min_seconds: float = 0.1,
        min_fraction: float = 0.005,
        stream=None,
    ):
        self.total = max(total, 1)
        self.name = name
        self.min_seconds = min_seconds
        self.step = max(1, int(self.total * min_fraction))
        self.stream = stream or sys.stderr
        self._next_count = self.step
        self._next_time = time.monotonic() + min_seconds
        self._done = 0
        self._extra = ""
        self._last_len = 0

    def _emit(self, completed: int, extra: str) -> None:
        frac = completed / self.total
        body = f"{self.name}: {completed}/{self.total} ({frac:.1%}) {extra}"
        # pad with spaces so a shorter line fully overwrites a longer one
        pad = " " * max(0, self._last_len - len(body))
        self._last_len = len(body)
        self.stream.write("\r" + body + pad)
        self.stream.flush()

    def update(self, completed: int, extra: str = "") -> None:
        self._done = completed
        self._extra = extra
        now = time.monotonic()
        if completed >= self.total or (
            completed >= self._next_count and now >= self._next_time
        ):
            self._emit(completed, extra)
            self._next_count = completed + self.step
            self._next_time = now + self.min_seconds

    def close(self) -> None:
        # the final state must always be visible, even if the last update
        # was throttled away (e.g. completed < total because some paths
        # permanently failed)
        self._emit(self._done, self._extra)
        self.stream.write("\n")
        self.stream.flush()
