"""Plotting (reference pymc/plots/ aliases arviz_plots; arviz is not a
dependency here, so the core diagnostics plots are implemented natively on
matplotlib: trace, posterior, forest, energy, autocorrelation, pair, rank,
posterior-predictive check)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "plot_trace",
    "plot_posterior",
    "plot_forest",
    "plot_energy",
    "plot_autocorr",
    "plot_pair",
    "plot_rank",
    "plot_ppc",
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


def plot_pair(idata, var_names=None, kind="scatter", divergences=False,
              figsize=None, max_vars=6):
    """Pairwise joint marginals (arviz plot_pair): scatter or 2-D histogram
    per variable pair, optionally highlighting divergent transitions."""
    import matplotlib.pyplot as plt

    pairs = _sel_vars(idata, var_names)[:max_vars]
    k = len(pairs)
    if k < 2:
        raise ValueError("plot_pair needs at least two scalar components")
    div = None
    if divergences and hasattr(idata, "sample_stats"):
        try:
            div = idata.sample_stats["diverging"].values.reshape(-1).astype(bool)
        except KeyError:
            div = None
    fig, axes = plt.subplots(k - 1, k - 1,
                             figsize=figsize or (2.2 * (k - 1), 2.2 * (k - 1)),
                             squeeze=False)
    for i in range(1, k):
        for j in range(k - 1):
            ax = axes[i - 1, j]
            if j >= i:
                ax.axis("off")
                continue
            x = pairs[j][1].reshape(-1)
            y = pairs[i][1].reshape(-1)
            if kind == "hexbin":
                ax.hexbin(x, y, gridsize=30, cmap="Blues")
            else:
                ax.plot(x, y, ".", ms=1.5, alpha=0.35)
                if div is not None and div.any():
                    ax.plot(x[div], y[div], "r.", ms=4, label="divergent")
            if i == k - 1:
                ax.set_xlabel(pairs[j][0])
            if j == 0:
                ax.set_ylabel(pairs[i][0])
    fig.tight_layout()
    return axes


def plot_rank(idata, var_names=None, bins=20, figsize=None):
    """Rank plots (Vehtari et al. 2021): per-chain histograms of the pooled
    ranks — uniform when chains mix; deviation flags divergence between
    chains (arviz plot_rank)."""
    import matplotlib.pyplot as plt

    pairs = _sel_vars(idata, var_names)
    n = len(pairs)
    fig, axes = plt.subplots(n, 1, figsize=figsize or (7, 2.0 * n),
                             squeeze=False)
    for i, (name, vals) in enumerate(pairs):
        C, S = vals.shape
        ranks = np.argsort(np.argsort(vals.reshape(-1))).reshape(C, S)
        ax = axes[i, 0]
        width = 0.9 / C
        edges = np.linspace(0, C * S, bins + 1)
        expected = S / bins
        for c in range(C):
            hist, _ = np.histogram(ranks[c], bins=edges)
            ax.bar(
                np.arange(bins) + c * width, hist, width=width,
                align="edge", alpha=0.8, label=f"chain {c}" if i == 0 else None,
            )
        ax.axhline(expected, color="k", ls="--", lw=1)
        ax.set_title(name)
        ax.set_xticks([])
    if n and vals.shape[0] <= 8:
        axes[0, 0].legend(fontsize=7)
    fig.tight_layout()
    return axes


def plot_ppc(idata, kind="kde", num_pp_samples=None, figsize=None,
             random_seed=0):
    """Posterior-predictive check (arviz plot_ppc): overlay predictive draws
    on the observed data, per observed variable. Requires the
    posterior_predictive group (pm.sample_posterior_predictive) and
    observed_data."""
    import matplotlib.pyplot as plt

    pp = getattr(idata, "posterior_predictive", None)
    obs = getattr(idata, "observed_data", None)
    if pp is None or obs is None:
        raise ValueError(
            "plot_ppc needs posterior_predictive and observed_data groups "
            "(run pm.sample_posterior_predictive with extend_inferencedata)"
        )
    names = [n for n in pp.keys() if n in set(obs.keys())]
    if not names:
        raise ValueError("no overlapping variables between groups")
    rng = np.random.default_rng(random_seed)
    fig, axes = plt.subplots(len(names), 1,
                             figsize=figsize or (7, 2.6 * len(names)),
                             squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i, 0]
        draws = pp[name].values
        flat = draws.reshape(-1, *draws.shape[2:])
        n_show = min(num_pp_samples or 40, flat.shape[0])
        idx = rng.choice(flat.shape[0], size=n_show, replace=False)
        o = np.asarray(obs[name].values).ravel()
        if kind == "hist":
            for j in idx:
                ax.hist(np.ravel(flat[j]), bins=40, histtype="step",
                        alpha=0.2, color="C0", density=True)
            ax.hist(o, bins=40, histtype="step", color="k", lw=2,
                    density=True, label="observed")
        else:
            grid = np.linspace(
                min(o.min(), flat.min()), max(o.max(), flat.max()), 200
            )
            for j in idx:
                ax.plot(grid, _kde(np.ravel(flat[j]), grid), "C0-",
                        alpha=0.15)
            ax.plot(grid, _kde(o, grid), "k-", lw=2, label="observed")
            mean_pp = flat.reshape(flat.shape[0], -1).mean(axis=0)
            ax.plot(grid, _kde(mean_pp, grid), "C1--", lw=1.5,
                    label="posterior predictive mean")
        ax.set_title(name)
        ax.legend(fontsize=8)
    fig.tight_layout()
    return axes


def _kde(x, grid):
    """Gaussian KDE with Silverman bandwidth (no scipy dependency in the
    plotting hot path; n is small here)."""
    x = np.asarray(x, dtype=float)
    n = x.size
    sd = x.std()
    if sd == 0 or n < 2:
        return np.zeros_like(grid)
    h = 0.9 * min(sd, (np.percentile(x, 75) - np.percentile(x, 25)) / 1.34
                  or sd) * n ** (-0.2)
    z = (grid[:, None] - x[None, :]) / h
    return np.exp(-0.5 * z**2).sum(axis=1) / (n * h * np.sqrt(2 * np.pi))


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
