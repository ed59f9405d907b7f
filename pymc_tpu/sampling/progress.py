"""Sampling progress display.

Parity: reference pymc/progress_bar/progress.py (ProgressBarManager:77,
per-step-method stat columns:215-497, rich-based). The TPU driver samples in
device-side chunks, so progress advances per chunk with live step-method
statistics — divergences, mean step size, mean tree depth, mean acceptance —
for BOTH the warmup and sampling phases (warmups are minutes-long on remote
TPU; the user must not fly blind). Degrades to log lines when rich is
unavailable or stderr is not a terminal.
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
    """Tracks warmup + sampling across all (vectorized) chains with live
    step-method stat columns (reference progress.py:215-497)."""

    _FIELDS = {"div": 0, "step": "-", "depth": "-", "acc": "-"}

    def __init__(self, total_draws, chains, tune=0, enabled=True):
        self.total = int(total_draws)
        self.tune = int(tune)
        self.chains = int(chains)
        self.done = 0
        self.tune_done = 0
        self.divergences = 0
        self.t0 = time.perf_counter()
        self.enabled = bool(enabled) and (self.total > 0 or self.tune > 0)
        self._rich = None
        self._task = None
        self._warm_task = None
        if self.enabled and _HAS_RICH and sys.stderr.isatty():
            self._rich = Progress(
                TextColumn("[progress.description]{task.description}"),
                BarColumn(),
                TextColumn("{task.completed}/{task.total}"),
                TextColumn("div={task.fields[div]}"),
                TextColumn("step={task.fields[step]}"),
                TextColumn("depth={task.fields[depth]}"),
                TextColumn("acc={task.fields[acc]}"),
                TimeElapsedColumn(),
                TimeRemainingColumn(),
            )
            self._rich.start()

    # ------------------------------------------------------------- warmup
    def update_warmup(self, n, divergences=0, step_size=None, depth=None,
                      accept=None):
        """Advance the warmup phase by n tuning draws (all chains)."""
        self.tune_done += n
        if not self.enabled:
            return
        fields = self._fields(divergences=None, step_size=step_size,
                              depth=depth, accept=accept)
        if self._rich is not None:
            if self._warm_task is None:
                self._warm_task = self._rich.add_task(
                    f"Warmup ({self.chains} chains)", total=self.tune,
                    **self._FIELDS,
                )
            fields["div"] = "-"
            self._rich.update(self._warm_task, advance=n, **fields)
        else:
            el = time.perf_counter() - self.t0
            _log.info(
                f"Warmup: {self.tune_done}/{self.tune} steps "
                f"[step={fields['step']}, depth={fields['depth']}, "
                f"acc={fields['acc']}] ({el:.0f}s)"
            )

    # ----------------------------------------------------------- sampling
    def update(self, n, divergences=0, step_size=None, depth=None,
               accept=None):
        self.done += n
        self.divergences += int(divergences)
        if not self.enabled:
            return
        fields = self._fields(self.divergences, step_size, depth, accept)
        if self._rich is not None:
            if self._warm_task is not None:
                # warmup phase over: pin its bar full
                self._rich.update(self._warm_task, completed=self.tune)
                self._warm_task = None
            if self._task is None:
                self._task = self._rich.add_task(
                    f"Sampling ({self.chains} chains)", total=self.total,
                    **self._FIELDS,
                )
            self._rich.update(self._task, advance=n, **fields)
        else:
            el = time.perf_counter() - self.t0
            rate = self.done * self.chains / max(el, 1e-9)
            _log.info(
                f"Sampling: {self.done}/{self.total} draws "
                f"({rate:,.0f} draws/s across {self.chains} chains, "
                f"{self.divergences} divergences, step={fields['step']}, "
                f"depth={fields['depth']}, acc={fields['acc']})"
            )

    @staticmethod
    def _fields(divergences=None, step_size=None, depth=None, accept=None):
        return {
            "div": "-" if divergences is None else int(divergences),
            "step": "-" if step_size is None else f"{step_size:.3g}",
            "depth": "-" if depth is None else f"{depth:.1f}",
            "acc": "-" if accept is None else f"{accept:.2f}",
        }

    def close(self):
        if self._rich is not None:
            self._rich.stop()
            self._rich = None
