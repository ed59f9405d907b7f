"""Plotting (reference pymc/plots/ aliases arviz_plots; arviz is not a
dependency here, so the core diagnostics plots are implemented natively on
matplotlib: trace, posterior, forest, energy, autocorrelation)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "plot_trace",
    "plot_posterior",
    "plot_forest",
    "plot_energy",
    "plot_autocorr",
]


def _sel_vars(idata, var_names, group="posterior"):
    ds = getattr(idata, group)
    names = list(ds.keys())
    if var_names is not None:
        names = [n for n in names if n in set(var_names)]
    out = []
    for n in names:
        vals = ds[n].values
        if not np.issubdtype(vals.dtype, np.number):
            continue
        extra = vals.shape[2:]
        if extra:
            flat = vals.reshape(vals.shape[0], vals.shape[1], -1)
            k = flat.shape[-1]
            idx_show = range(min(k, 6))  # cap panels per vector var
            for j in idx_show:
                out.append((f"{n}[{j}]", flat[:, :, j]))
        else:
            out.append((n, vals))
    return out


def plot_trace(idata, var_names=None, figsize=None):
    """Trace + marginal density per variable (arviz plot_trace layout)."""
    import matplotlib.pyplot as plt

    pairs = _sel_vars(idata, var_names)
    n = len(pairs)
    fig, axes = plt.subplots(n, 2, figsize=figsize or (10, 2.2 * n),
                             squeeze=False)
    for i, (name, vals) in enumerate(pairs):
        for c in range(vals.shape[0]):
            axes[i, 0].hist(vals[c], bins=50, histtype="step", density=True)
            axes[i, 1].plot(vals[c], lw=0.5, alpha=0.8)
        axes[i, 0].set_title(name)
        axes[i, 1].set_title(name)
    fig.tight_layout()
    return axes


def plot_posterior(idata, var_names=None, hdi_prob=0.94, figsize=None):
    import matplotlib.pyplot as plt

    from .stats.summary import hdi as hdi_fn

    pairs = _sel_vars(idata, var_names)
    n = len(pairs)
    ncol = min(n, 3)
    nrow = (n + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=figsize or (4 * ncol, 2.5 * nrow),
                             squeeze=False)
    for i, (name, vals) in enumerate(pairs):
        ax = axes[i // ncol, i % ncol]
        flat = vals.reshape(-1)
        ax.hist(flat, bins=60, density=True, alpha=0.6)
        lo, hi = hdi_fn(vals, hdi_prob)
        ax.axvline(flat.mean(), color="k", lw=1)
        ax.plot([lo, hi], [0, 0], "k-", lw=4)
        ax.set_title(f"{name}\nmean={flat.mean():.3g} hdi=[{float(lo):.3g}, {float(hi):.3g}]")
    fig.tight_layout()
    return axes


def plot_forest(idata, var_names=None, hdi_prob=0.94, figsize=None):
    import matplotlib.pyplot as plt

    from .stats.summary import hdi as hdi_fn

    pairs = _sel_vars(idata, var_names)
    fig, ax = plt.subplots(figsize=figsize or (7, 0.45 * len(pairs) + 1))
    for i, (name, vals) in enumerate(reversed(pairs)):
        lo, hi = hdi_fn(vals, hdi_prob)
        m = vals.mean()
        ax.plot([lo, hi], [i, i], "b-", lw=2)
        ax.plot([m], [i], "bo")
    ax.set_yticks(range(len(pairs)))
    ax.set_yticklabels([p[0] for p in reversed(pairs)])
    fig.tight_layout()
    return ax


def plot_energy(idata, figsize=None):
    """Energy transition vs marginal distributions (BFMI diagnostic)."""
    import matplotlib.pyplot as plt

    e = idata.sample_stats["energy"].values
    de = np.diff(e, axis=1)
    fig, ax = plt.subplots(figsize=figsize or (7, 4))
    ax.hist((e - e.mean()).ravel(), bins=60, density=True, alpha=0.5,
            label="energy (centered)")
    ax.hist(de.ravel(), bins=60, density=True, alpha=0.5,
            label="energy transition")
    bfmi = de.var(axis=1) / e.var(axis=1)
    ax.legend(title=f"BFMI per chain: {np.round(bfmi, 2)}")
    fig.tight_layout()
    return ax


def plot_autocorr(idata, var_names=None, max_lag=100, figsize=None):
    import matplotlib.pyplot as plt

    pairs = _sel_vars(idata, var_names)
    n = len(pairs)
    fig, axes = plt.subplots(n, 1, figsize=figsize or (7, 1.8 * n),
                             squeeze=False)
    for i, (name, vals) in enumerate(pairs):
        x = vals[0] - vals[0].mean()
        ac = np.correlate(x, x, mode="full")[len(x) - 1:]
        ac = ac[:max_lag] / ac[0]
        axes[i, 0].bar(range(len(ac)), ac, width=1.0)
        axes[i, 0].set_title(name)
    fig.tight_layout()
    return axes
