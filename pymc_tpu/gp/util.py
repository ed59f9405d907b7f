"""GP utilities.

Parity: reference pymc/gp/util.py — `stabilize` (jitter on the diagonal),
`kmeans_inducing_points` (scipy k-means initialization for sparse
approximations), `plot_gp_dist` (percentile-band plot of 1-D GP posteriors).
`replace_with_values` is covered by `pm.compile`/`graph.evaluate` env
substitution and `conditioned_vars` by explicit attributes on the gp
implementations.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph import Node, evaluate

JITTER_DEFAULT = 1e-6

__all__ = ["stabilize", "kmeans_inducing_points", "plot_gp_dist",
           "replace_with_values", "JITTER_DEFAULT"]


def stabilize(K, jitter=None):
    """Add `jitter` to the diagonal of a covariance for Cholesky safety
    (reference gp/util.py:77). Default is dtype-aware: JITTER_DEFAULT (1e-6)
    in float64, 1e-4 in float32 where kernel matrices go indefinite at the
    reference's float64 value."""
    from .gp import _stabilize

    return _stabilize(K, jitter)


def replace_with_values(vars_needed, replacements=None, model=None):
    """Evaluate graph nodes under a {name: value} environment
    (reference gp/util.py:30, pytensor graph_replace -> env substitution)."""
    env = dict(replacements or {})
    memo = {}
    out = [
        np.asarray(evaluate(v, env, memo)) if isinstance(v, Node) else v
        for v in vars_needed
    ]
    return out[0] if len(out) == 1 else out


def kmeans_inducing_points(n_inducing, X, **kmeans_kwargs):
    """K-means initialization of inducing point locations
    (reference gp/util.py:95; whiten -> scipy kmeans -> unwhiten)."""
    if isinstance(X, Node):
        X = evaluate(X, {})
    if isinstance(X, (np.ndarray, jnp.ndarray, tuple, list)):
        X = np.asarray(X, dtype=np.float64)
    else:
        raise TypeError(
            f"X must be castable to an ndarray for k-means, got {type(X)}"
        )
    scaling = np.std(X, 0)
    scaling[scaling <= 1e-6] = 1.0
    Xw = X / scaling
    from scipy.cluster.vq import kmeans

    Xu, _ = kmeans(Xw, k_or_guess=n_inducing, **kmeans_kwargs)
    return Xu * scaling


def plot_gp_dist(
    ax,
    samples,
    x,
    plot_samples=True,
    palette="Reds",
    fill_alpha=0.8,
    samples_alpha=0.1,
    fill_kwargs=None,
    samples_kwargs=None,
):
    """Percentile-band plot of 1-D GP posterior samples
    (reference gp/util.py:167). samples: (S, X); x: (X,)."""
    import matplotlib.pyplot as plt

    fill_kwargs = fill_kwargs or {}
    samples_kwargs = samples_kwargs or {}
    samples = np.asarray(samples)
    x = np.asarray(x).ravel()
    if samples.ndim != 2:
        samples = samples.reshape(-1, x.size)

    cmap = plt.get_cmap(palette)
    percs = np.linspace(51, 99, 40)
    colors = (percs - np.min(percs)) / (np.max(percs) - np.min(percs))
    idx = np.argsort(x)
    for i, p in enumerate(percs[::-1]):
        upper = np.percentile(samples, p, axis=0)
        lower = np.percentile(samples, 100 - p, axis=0)
        ax.fill_between(
            x[idx], upper[idx], lower[idx],
            color=cmap(colors[i]), alpha=fill_alpha, **fill_kwargs,
        )
    if plot_samples:
        ax.plot(
            x[idx], samples[:: max(1, samples.shape[0] // 30)][:, idx].T,
            color=cmap(0.9), lw=1, alpha=samples_alpha, **samples_kwargs,
        )
    return ax
