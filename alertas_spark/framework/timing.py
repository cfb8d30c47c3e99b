"""Per-phase wall-clock instrumentation.

≙ the reference's ``Timer`` context manager (``/root/reference/src/alertas/
timer.py:5-13``), which wraps every alert computation and prints elapsed seconds,
paired with ``setJobGroup`` so the Spark UI attributes each job to its alert
(``jobs.py:189,253``).  Extended to record into a dict so callers (CLI, tests,
benchmarks) get the numbers programmatically, not just on stdout.
"""

from __future__ import annotations

import time


class Timer:
    """``with Timer("VADF", sink): ...`` — prints and records elapsed seconds."""

    def __init__(self, label: str, sink: dict[str, float] | None = None,
                 quiet: bool = False):
        self.label = label
        self.sink = sink
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.time()
        return self

    def __exit__(self, exc_t, exc_v, trace) -> None:
        self.elapsed = time.time() - self._t0
        if self.sink is not None:
            self.sink[self.label] = round(self.elapsed, 3)
        if not self.quiet:
            print(f"{self.label}: {self.elapsed:.1f}s")
