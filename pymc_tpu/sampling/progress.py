"""Sampling progress display.

Parity: reference pymc/progress_bar/progress.py (ProgressBarManager:77 with
per-step-method stat columns, rich-based). Degrades to log lines when rich
is unavailable or output is not a terminal.
"""

from __future__ import annotations

import logging
import sys
import time

_log = logging.getLogger("pymc_tpu")

try:
    from rich.progress import (
        BarColumn,
        Progress,
        TextColumn,
        TimeElapsedColumn,
        TimeRemainingColumn,
    )

    _HAS_RICH = True
except Exception:  # pragma: no cover
    _HAS_RICH = False


class ProgressManager:
    """Tracks draws across all (vectorized) chains with a divergence column."""

    def __init__(self, total_draws, chains, enabled=True):
        self.total = int(total_draws)
        self.chains = int(chains)
        self.done = 0
        self.divergences = 0
        self.t0 = time.perf_counter()
        self.enabled = bool(enabled) and self.total > 0
        self._rich = None
        if self.enabled and _HAS_RICH and sys.stderr.isatty():
            self._rich = Progress(
                TextColumn("[progress.description]{task.description}"),
                BarColumn(),
                TextColumn("{task.completed}/{task.total} draws"),
                TextColumn("div={task.fields[div]}"),
                TimeElapsedColumn(),
                TimeRemainingColumn(),
            )
            self._rich.start()
            self._task = self._rich.add_task(
                f"Sampling {self.chains} chains", total=self.total, div=0
            )

    def update(self, n, divergences=0):
        self.done += n
        self.divergences += divergences
        if not self.enabled:
            return
        if self._rich is not None:
            self._rich.update(self._task, advance=n, div=self.divergences)
        else:
            el = time.perf_counter() - self.t0
            rate = self.done * self.chains / max(el, 1e-9)
            _log.info(
                f"Sampling: {self.done}/{self.total} draws "
                f"({rate:,.0f} draws/s across {self.chains} chains, "
                f"{self.divergences} divergences)"
            )

    def close(self):
        if self._rich is not None:
            self._rich.stop()
