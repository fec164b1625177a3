"""Per-chunk wall-clock timing with pause/resume (reference:
src/util/Timer.hpp) — drives pipeline rebalancing and the end-of-run
timing report."""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self._records: list[float] = []
        self._start: float | None = None
        self._paused_total = 0.0
        self._pause_start: float | None = None

    def start(self):
        self._start = time.perf_counter()
        self._paused_total = 0.0

    def pause(self):
        if self._pause_start is None:
            self._pause_start = time.perf_counter()

    def resume(self):
        if self._pause_start is not None:
            self._paused_total += time.perf_counter() - self._pause_start
            self._pause_start = None

    def stop(self):
        if self._start is None:
            return
        self.resume()
        self._records.append(
            time.perf_counter() - self._start - self._paused_total)
        self._start = None

    @property
    def records(self) -> list[float]:
        return list(self._records)

    def sum(self) -> float:
        return sum(self._records)

    def avg(self) -> float:
        return self.sum() / len(self._records) if self._records else 0.0

    def clear(self):
        self._records.clear()

    def extend(self, other: "Timer"):
        self._records.extend(other._records)
