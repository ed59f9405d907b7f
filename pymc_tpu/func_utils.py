"""Utility functions.

Parity: reference pymc/func_utils.py:31 (find_constrained_prior — optimize
distribution parameters so a given probability mass lies within bounds).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from .config import floatX

__all__ = ["find_constrained_prior"]

_log = logging.getLogger("pymc_tpu")


def find_constrained_prior(
    distribution,
    lower,
    upper,
    init_guess,
    mass=0.95,
    fixed_params=None,
    mass_below_lower=None,
):
    """Find distribution parameters such that `mass` probability lies in
    (lower, upper) (reference func_utils.py:31).

    distribution: a Distribution class (e.g. pm.Gamma)
    init_guess: {param_name: value} for the free parameters
    fixed_params: {param_name: value} held fixed
    """
    from scipy import optimize

    fixed_params = dict(fixed_params or {})
    names = list(init_guess.keys())
    if mass_below_lower is None:
        mass_below_lower = (1.0 - mass) / 2.0
    target_lower = mass_below_lower
    target_upper = mass_below_lower + mass

    def make_dist(vals):
        kwargs = dict(fixed_params)
        kwargs.update({n: v for n, v in zip(names, vals)})
        return distribution.dist(**kwargs)

    def loss_fn(vals):
        d = make_dist([jnp.asarray(v, floatX()) for v in vals])
        cdf_l = jnp.exp(d.logcdf(jnp.asarray(lower, floatX())))
        cdf_u = jnp.exp(d.logcdf(jnp.asarray(upper, floatX())))
        return (cdf_l - target_lower) ** 2 + (cdf_u - target_upper) ** 2

    grad_fn = jax.jit(jax.value_and_grad(lambda v: loss_fn(list(v))))

    def f(v):
        val, g = grad_fn(jnp.asarray(v, floatX()))
        return (
            float(np.asarray(jax.device_get(val))),
            np.asarray(jax.device_get(g), dtype=np.float64),
        )

    x0 = np.asarray([init_guess[n] for n in names], dtype=np.float64)
    res = optimize.minimize(f, x0, jac=True, method="L-BFGS-B")
    if res.fun > 1e-6:
        # L-BFGS-B's unit-norm first trial can land on a degenerate boundary
        # (e.g. sigma=0) and stall at x0; Nelder-Mead is robust for the
        # small parameter counts involved here
        res_nm = optimize.minimize(
            lambda v: f(v)[0], x0, method="Nelder-Mead",
            options={"xatol": 1e-10, "fatol": 1e-12, "maxiter": 5000},
        )
        if res_nm.fun < res.fun:
            res = res_nm
    if res.fun > 1e-5:
        _log.warning(
            f"find_constrained_prior converged to loss {res.fun:.2g}; the "
            "requested mass may not be achievable with this distribution."
        )
    return {n: float(v) for n, v in zip(names, res.x)}
