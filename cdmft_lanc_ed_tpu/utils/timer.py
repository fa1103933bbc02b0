"""Wall-clock timing + progress instrumentation.

Replacement for the reference's SF_TIMER usage (start_timer/stop_timer/eta
around diagonalization, GF build, observables — SURVEY.md section 5.1).
Collected timings are kept on the solver and written to ``timings.ed`` so
perf regressions are visible run-over-run.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Dict, Optional


class Timers:
    def __init__(self, log: Optional[Callable[[str], None]] = None):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.log = log or (lambda s: None)

    @contextmanager
    def __call__(self, name: str):
        # timed solver stages double as dispatch-count attribution
        # buckets (utils/dispatch.py; counting is off unless a bench
        # enabled it)
        from . import dispatch
        t0 = time.time()
        try:
            with dispatch.stage(name):
                yield
        finally:
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.log(f"[timer] {name}: {dt:.3f}s "
                     f"(total {self.totals[name]:.3f}s "
                     f"x{self.counts[name]})")

    def write(self, path: str) -> None:
        try:
            with open(path, "w") as fh:
                for name in sorted(self.totals):
                    fh.write(f"{name} {self.totals[name]:.6f} "
                             f"{self.counts[name]}\n")
        except OSError:
            pass


def eta(log: Callable[[str], None], i: int, n: int, t0: float,
        label: str = "") -> None:
    """Progress + estimated time remaining (SF_TIMER eta equivalent)."""
    if i == 0:
        return
    el = time.time() - t0
    rem = el / i * (n - i)
    log(f"{label}{i}/{n} elapsed {el:6.1f}s eta {rem:6.1f}s")
