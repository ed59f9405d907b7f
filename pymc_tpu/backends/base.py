"""Trace interface parity shims.

Parity: reference pymc/backends/base.py (IBaseTrace:47, BaseTrace:148,
MultiTrace:322) and backends/ndarray.py:27 (NDArray).

The TPU sampler's native output is device arrays -> InferenceData; these
classes provide the reference's chain-trace protocol for code written against
it (record/get_values/get_sampler_stats/slicing/point access).
"""

from __future__ import annotations

import numpy as np

__all__ = ["IBaseTrace", "NDArray", "MultiTrace", "multitrace_from_idata"]


class IBaseTrace:
    """Reference backends/base.py:47."""

    chain: int = 0
    varnames: list = []

    def __len__(self):
        raise NotImplementedError

    def record(self, point, stats=None):
        raise NotImplementedError

    def get_values(self, varname, burn=0, thin=1):
        raise NotImplementedError

    def get_sampler_stats(self, stat_name, burn=0, thin=1):
        raise NotImplementedError

    def point(self, idx):
        raise NotImplementedError

    def close(self):
        pass


class NDArray(IBaseTrace):
    """In-memory list-backed trace (reference backends/ndarray.py:27)."""

    def __init__(self, chain=0, varnames=None):
        self.chain = chain
        self.varnames = list(varnames or [])
        self._draws = []
        self._stats = []

    def __len__(self):
        return len(self._draws)

    def record(self, point, stats=None):
        if not self.varnames:
            self.varnames = list(point.keys())
        self._draws.append({k: np.asarray(v) for k, v in point.items()})
        self._stats.append(dict(stats or {}))

    def get_values(self, varname, burn=0, thin=1):
        return np.asarray([d[varname] for d in self._draws[burn::thin]])

    def get_sampler_stats(self, stat_name, burn=0, thin=1):
        return np.asarray([s.get(stat_name) for s in self._stats[burn::thin]])

    def point(self, idx):
        return dict(self._draws[idx])


class MultiTrace:
    """Reference backends/base.py:322."""

    def __init__(self, straces):
        self._straces = {t.chain: t for t in straces}

    @property
    def nchains(self):
        return len(self._straces)

    @property
    def chains(self):
        return sorted(self._straces)

    @property
    def varnames(self):
        first = self._straces[self.chains[0]]
        return first.varnames

    def __len__(self):
        return len(self._straces[self.chains[0]])

    def get_values(self, varname, burn=0, thin=1, combine=True, chains=None):
        chains = self.chains if chains is None else chains
        vals = [
            self._straces[c].get_values(varname, burn, thin) for c in chains
        ]
        return np.concatenate(vals) if combine else vals

    def get_sampler_stats(self, stat_name, burn=0, thin=1, combine=True):
        vals = [
            self._straces[c].get_sampler_stats(stat_name, burn, thin)
            for c in self.chains
        ]
        return np.concatenate(vals) if combine else vals

    def point(self, idx, chain=None):
        chain = self.chains[-1] if chain is None else chain
        return self._straces[chain].point(idx)

    def __getitem__(self, varname):
        return self.get_values(varname)


def multitrace_from_idata(idata):
    """Build a MultiTrace view over an InferenceData posterior."""
    post = idata.posterior
    names = list(post.keys())
    n_chains = post.dims.get("chain", 1)
    traces = []
    for c in range(n_chains):
        t = NDArray(chain=c, varnames=names)
        n_draws = post.dims.get("draw", 0)
        for i in range(n_draws):
            t.record({k: post[k].values[c, i] for k in names})
        traces.append(t)
    return MultiTrace(traces)
