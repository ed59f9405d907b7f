"""Sampling progress display.

Parity: reference pymc/progress_bar/progress.py (ProgressBarManager:77,
per-step-method stat columns:215-497, per-chain or combined layout, rich-
based). The TPU driver samples in device-side chunks, so progress advances
per chunk with live step-method statistics — divergences, mean step size,
mean tree depth, mean acceptance — for BOTH the warmup and sampling phases
(warmups are minutes-long on remote TPU; the user must not fly blind).

Like the reference's `full_stats` per-chain layout (progress.py:215), when
the chain count is small enough to read (<=12) each chain gets its own live
row with its divergence count, step size, tree depth, and acceptance;
beyond that the display collapses to the combined bar. ETA comes from
rich's TimeRemainingColumn. Degrades to log lines when rich is unavailable
or stderr is not a terminal.
"""

from __future__ import annotations

import logging
import sys
import time

import numpy as np

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

PER_CHAIN_LIMIT = 12


class ProgressManager:
    """Tracks warmup + sampling across all (vectorized) chains with live
    step-method stat columns (reference progress.py:215-497)."""

    _FIELDS = {"div": 0, "step": "-", "depth": "-", "acc": "-"}

    def __init__(self, total_draws, chains, tune=0, enabled=True,
                 per_chain=None):
        self.total = int(total_draws)
        self.tune = int(tune)
        self.chains = int(chains)
        self.done = 0
        self.tune_done = 0
        self.divergences = 0
        self.chain_divergences = np.zeros(self.chains, dtype=int)
        self.t0 = time.perf_counter()
        self.enabled = bool(enabled) and (self.total > 0 or self.tune > 0)
        self.per_chain = (
            per_chain if per_chain is not None
            else self.chains <= PER_CHAIN_LIMIT
        )
        self._rich = None
        self._task = None
        self._warm_task = None
        self._chain_tasks = None
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

    # --------------------------------------------------------- chain rows
    def _ensure_chain_tasks(self, phase_total):
        if not (self.per_chain and self._rich is not None):
            return
        if self._chain_tasks is None:
            self._chain_tasks = [
                self._rich.add_task(
                    f"  chain {c}", total=self.tune + self.total,
                    **self._FIELDS,
                )
                for c in range(self.chains)
            ]

    def _update_chain_rows(self, n, chain_stats):
        if not (self.per_chain and self._rich is not None):
            return
        if chain_stats is None:
            return
        self._ensure_chain_tasks(self.total)
        div = chain_stats.get("div")
        if div is not None:
            self.chain_divergences += np.asarray(div, dtype=int)
        for c, task in enumerate(self._chain_tasks):
            fields = self._fields(
                int(self.chain_divergences[c]),
                _at(chain_stats.get("step"), c),
                _at(chain_stats.get("depth"), c),
                _at(chain_stats.get("accept"), c),
            )
            self._rich.update(task, advance=n, **fields)

    # ------------------------------------------------------------- warmup
    def update_warmup(self, n, divergences=0, step_size=None, depth=None,
                      accept=None, chain_stats=None):
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
            self._update_chain_rows(n, chain_stats)
        else:
            el = time.perf_counter() - self.t0
            _log.info(
                f"Warmup: {self.tune_done}/{self.tune} steps "
                f"[step={fields['step']}, depth={fields['depth']}, "
                f"acc={fields['acc']}] ({el:.0f}s)"
            )

    # ----------------------------------------------------------- sampling
    def update(self, n, divergences=0, step_size=None, depth=None,
               accept=None, chain_stats=None):
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
            self._update_chain_rows(n, chain_stats)
        else:
            el = time.perf_counter() - self.t0
            rate = self.done * self.chains / max(el, 1e-9)
            eta = (self.total - self.done) / max(self.done / max(el, 1e-9), 1e-9)
            _log.info(
                f"Sampling: {self.done}/{self.total} draws "
                f"({rate:,.0f} draws/s across {self.chains} chains, "
                f"{self.divergences} divergences, step={fields['step']}, "
                f"depth={fields['depth']}, acc={fields['acc']}, "
                f"ETA {eta:.0f}s)"
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


def _at(arr, c):
    if arr is None:
        return None
    return float(np.asarray(arr)[c])
