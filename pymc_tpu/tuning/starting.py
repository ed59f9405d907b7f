"""MAP estimation.

Parity: reference pymc/tuning/starting.py (find_MAP:52 — scipy.optimize over
the raveled unconstrained vector with jitted value+grad, CostFuncWrapper:206)
and pymc/tuning/scaling.py (find_hessian:45, guess_scaling:77).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import ravel_point, unravel_vector
from ..config import floatX
from ..model.core import modelcontext

__all__ = ["find_MAP", "find_hessian", "guess_scaling"]

_log = logging.getLogger("pymc_tpu")


def find_MAP(
    start=None,
    vars=None,
    method="L-BFGS-B",
    return_raw=False,
    include_transformed=True,
    progressbar=True,
    maxeval=5000,
    model=None,
    seed=None,
    **kwargs,
):
    """Maximum a posteriori point via scipy.optimize over the jitted
    logp/grad (reference starting.py:52)."""
    from scipy import optimize

    model = modelcontext(model)
    if model.discrete_value_vars:
        _log.warning(
            "Model has discrete free variables; MAP optimizes the continuous "
            "conditional at their initial values (reference behavior)."
        )
    info = model.raveled_info()
    # jacobian=False: MAP is the mode of the CONSTRAINED-space density; the
    # transform jacobian would shift bounded-variable modes (reference
    # starting.py:145 compile_logp(jacobian=False) — test_mle_jacobian pins
    # that a flat-prior bounded model's MAP equals the unbounded MLE)
    logp_dict = model.logp_fn(jacobian=False)

    disc_vals = {}
    init = model.initial_point(random_seed=seed or 0)
    for rv in model.discrete_value_vars:
        disc_vals[rv.value_name] = init[rv.value_name]

    def flat_neg(q):
        vals = unravel_vector(q, info)
        vals.update(disc_vals)
        return -logp_dict(vals)

    vg = jax.jit(jax.value_and_grad(flat_neg))

    if start is not None:
        pt = dict(init)
        uncon = model.unconstrain({**_constrained_of(model, init), **start})
        pt.update({k: v for k, v in uncon.items() if k in info.names})
        q0 = ravel_point(pt, info)
    else:
        q0 = ravel_point(init, info)
    q0 = np.asarray(jax.device_get(q0), dtype=np.float64)

    gradient_free = str(method).lower() in {
        "powell", "nelder-mead", "cobyla", "cobyqa"
    }

    def f(q):
        v, g = vg(jnp.asarray(q, dtype=floatX()))
        v = float(np.asarray(jax.device_get(v)))
        g = np.asarray(jax.device_get(g), dtype=np.float64)
        if not np.isfinite(v):
            return 1e100, np.zeros_like(g)
        return v, g

    res = optimize.minimize(
        (lambda q: f(q)[0]) if gradient_free else f,
        q0, jac=not gradient_free, method=method,
        options={"maxiter": maxeval, **kwargs},
    )
    q_map = jnp.asarray(res.x, dtype=floatX())
    vals = unravel_vector(q_map, info)
    constrained = model.constrain(vals)
    out = {
        k: np.asarray(jax.device_get(v)) for k, v in constrained.items()
    }
    # deterministics at the MAP
    from ..graph import evaluate

    memo = {}
    for det in model.deterministics:
        out[det.name] = np.asarray(
            jax.device_get(evaluate(det, constrained, memo))
        )
    for k, v in disc_vals.items():
        out[k.replace("__", "")] = np.asarray(jax.device_get(v))
    if include_transformed:
        for k, v in vals.items():
            out[k] = np.asarray(jax.device_get(v))
    if return_raw:
        return out, res
    return out


def _constrained_of(model, value_dict):
    env = model.constrain(value_dict)
    return {k: v for k, v in env.items() if isinstance(k, str)}


def find_hessian(point=None, vars=None, model=None, negate_output=True):
    """Hessian of -logp at a point, over the unconstrained flat space
    (reference tuning/scaling.py:45) — exact via jax.hessian, not finite
    differences."""
    model = modelcontext(model)
    info = model.raveled_info()
    logp_dict = model.logp_fn()

    def flat_logp(q):
        return logp_dict(unravel_vector(q, info))

    if point is None:
        q0 = ravel_point(model.initial_point(), info)
    else:
        if any(n in point for n in info.names):
            q0 = ravel_point({**model.initial_point(), **point}, info)
        else:
            q0 = ravel_point(model.unconstrain(point), info)
    H = jax.jit(jax.hessian(flat_logp))(q0)
    H = np.asarray(jax.device_get(H))
    return -H if negate_output else H


def guess_scaling(point, vars=None, model=None, scaling_bound=1e-8):
    """Diagonal scaling guess from the Hessian (reference scaling.py:77)."""
    H = find_hessian(point, vars, model)
    d = np.abs(np.diagonal(H))
    d = np.clip(d, scaling_bound, 1.0 / scaling_bound)
    return 1.0 / d
