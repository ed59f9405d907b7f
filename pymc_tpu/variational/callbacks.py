"""VI fit callbacks (reference pymc/variational/callbacks.py:
CheckParametersConvergence:45, Tracker:94)."""

from __future__ import annotations

import numpy as np
import jax

__all__ = ["Callback", "CheckParametersConvergence", "Tracker"]


class Callback:
    def __call__(self, approx, loss_hist, i):  # pragma: no cover
        raise NotImplementedError


class CheckParametersConvergence(Callback):
    """Raise StopIteration when parameter changes fall below tolerance."""

    def __init__(self, every=100, tolerance=1e-3, diff="relative", ord=np.inf):
        self.every = every
        self.tolerance = tolerance
        self.diff = diff
        self.ord = ord
        self.prev = None

    def flatten(self, approx):
        leaves = jax.tree.leaves(approx.params)
        return np.concatenate(
            [np.asarray(jax.device_get(x)).ravel() for x in leaves]
        )

    def __call__(self, approx, loss_hist, i):
        if i % self.every and i > 0:
            return
        current = self.flatten(approx)
        if self.prev is not None:
            delta = current - self.prev
            if self.diff == "relative":
                denom = np.abs(self.prev) + 1e-10
                delta = delta / denom
            norm = np.linalg.norm(delta, self.ord)
            self.prev = current
            if norm < self.tolerance:
                raise StopIteration(f"Convergence achieved at {i}")
        else:
            self.prev = current


class Tracker(Callback):
    """Record arbitrary statistics during fit (reference callbacks.py:94).

    Tracker(mean=lambda approx: approx.params["mu"], ...)"""

    def __init__(self, **kwargs):
        self.whatchdict = kwargs
        self.hist = {k: [] for k in kwargs}

    def __call__(self, approx, loss_hist, i):
        # reference contract (callbacks.py:98): try fn() with no args;
        # if that fails, pass (approx, hist, i)
        for k, fn in self.whatchdict.items():
            try:
                val = fn()
            except TypeError:
                val = fn(approx, loss_hist, i)
            self.hist[k].append(np.asarray(jax.device_get(val)))

    def __getitem__(self, k):
        return self.hist[k]
