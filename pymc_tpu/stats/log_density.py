"""Post-hoc log-density computation over a posterior.

Parity: reference pymc/stats/log_density.py (compute_log_likelihood:31,
compute_log_prior:80).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import evaluate
from ..model.core import modelcontext

__all__ = ["compute_log_likelihood", "compute_log_prior"]


def _posterior_env(model, idata):
    post = idata.posterior
    traced = {}
    C = D = None
    for rv in model.free_RVs:
        if rv.name in post:
            vals = np.asarray(post[rv.name].values)
            C, D = vals.shape[:2]
            traced[rv.name] = jnp.asarray(vals.reshape((C * D,) + vals.shape[2:]))
    return traced, C, D


def compute_log_likelihood(
    idata, *, var_names=None, extend_inferencedata=True, model=None,
    sample_dims=("chain", "draw"), progressbar=True, compile_kwargs=None,
):
    """Elementwise observed-data log-likelihoods per draw
    (reference log_density.py:31)."""
    model = modelcontext(model)
    traced, C, D = _posterior_env(model, idata)
    if var_names is not None:
        obs_names = {orv.name for orv in model.observed_RVs}
        bad = set(var_names) - obs_names
        if bad:
            raise ValueError(
                f"var_names must refer to observed_RVs in the model. "
                f"Got: {sorted(bad)}"
            )
    obs = [
        orv for orv in model.observed_RVs
        if var_names is None or orv.name in set(var_names)
    ]

    def fn(env):
        memo = {}
        out = {}
        for orv in obs:
            val = orv._eval(env, memo)
            out[orv.name] = orv.dist.logp(val, env, memo)
        return out

    out = jax.jit(jax.vmap(fn))(traced)
    result = {
        k: np.asarray(jax.device_get(v)).reshape((C, D) + v.shape[1:])
        for k, v in out.items()
    }
    from ..backends.arviz import dataset_from_draws

    ds = dataset_from_draws(model, result)
    if extend_inferencedata:
        idata.add_group("log_likelihood", ds)
        return idata
    return ds


def compute_log_prior(
    idata, *, var_names=None, extend_inferencedata=True, model=None,
    sample_dims=("chain", "draw"), progressbar=True, compile_kwargs=None,
):
    """Elementwise prior log-densities per draw (reference log_density.py:80)."""
    model = modelcontext(model)
    traced, C, D = _posterior_env(model, idata)
    rvs = [
        rv for rv in model.free_RVs
        if var_names is None or rv.name in set(var_names)
    ]

    def fn(env):
        memo = {}
        return {rv.name: rv.dist.logp(env[rv.name], env, memo) for rv in rvs}

    out = jax.jit(jax.vmap(fn))(traced)
    result = {
        k: np.asarray(jax.device_get(v)).reshape((C, D) + v.shape[1:])
        for k, v in out.items()
    }
    from ..backends.arviz import dataset_from_draws

    ds = dataset_from_draws(model, result)
    if extend_inferencedata:
        idata.add_group("log_prior", ds)
        return idata
    return ds
