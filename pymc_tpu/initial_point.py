"""Initial points for samplers.

Parity: reference pymc/initial_point.py (per-RV strategy "support_point" |
"prior" | fixed value, dependency-ordered evaluation, U(-1,1) jitter in
TRANSFORMED space, make_initial_point_fns_per_chain:71). Here the whole
procedure is one jittable function, vmappable over chains.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import floatX
from .graph import evaluate

__all__ = ["make_initial_point", "make_initial_points_per_chain"]


def _base_point(model, key, overrides=None, default_strategy="support_point"):
    """Compute {value_name: unconstrained initial value} in dependency order.

    overrides: {rv_name_or_value_name: array | "prior" | "support_point"}
    """
    # registered initvals first, CALL-TIME overrides win (reference
    # make_initial_point_fn: ipfns overrides > model initvals > strategy)
    merged = dict(model.rvs_to_initial_values)
    merged.update(overrides or {})
    overrides = merged
    env = {}
    values = {}
    memo = {}
    for i, rv in enumerate(model.free_RVs):
        strategy = overrides.get(rv.name, overrides.get(rv.value_name, default_strategy))
        if isinstance(strategy, str) and strategy == "support_point":
            x = rv.dist.support_point(env, memo)
        elif isinstance(strategy, str) and strategy == "prior":
            x = rv.dist.sample(jax.random.fold_in(key, i), (), env, memo)
        elif isinstance(strategy, str) and strategy == "moment":
            # reference deprecated alias for support_point
            x = rv.dist.support_point(env, memo)
        else:
            from .graph import Node, rv_ancestors

            if isinstance(strategy, Node):
                # reference initial_point: symbolic initvals may not depend
                # on other random variables
                if rv_ancestors([strategy]):
                    raise ValueError(
                        f"Initial value of {rv.name} depends on other random "
                        "variables; that is not supported (reference "
                        "initial_point contract)."
                    )
                strategy = evaluate(strategy)
            x = jnp.asarray(strategy)
            if x.shape != tuple(rv.shape):
                x = jnp.broadcast_to(x, rv.shape)
            if not rv.dist.is_discrete:
                x = x.astype(floatX())
        x = jnp.broadcast_to(x, rv.shape)
        env[rv.name] = x
        v = rv.transform.forward(x, env) if rv.transform is not None else x
        values[rv.value_name] = v
    return values


def make_initial_point(model, key, jitter=0.0, overrides=None):
    """One initial point (unconstrained value dict)."""
    values = _base_point(model, key, overrides)
    if jitter:
        for i, (name, v) in enumerate(values.items()):
            if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                u = jax.random.uniform(
                    jax.random.fold_in(key, 10_000 + i),
                    jnp.shape(v),
                    minval=-jitter,
                    maxval=jitter,
                    dtype=floatX(),
                )
                values[name] = v + u
    return {k: jnp.asarray(v) for k, v in values.items()}


def make_initial_points_per_chain(
    model, key, chains, jitter=1.0, overrides=None, logp_fn=None,
    jitter_max_retries=10,
):
    """Stacked initial points with leading chain axis, each jittered until the
    model logp is finite (reference _init_jitter, sampling/mcmc.py:1695).

    Retries are vectorized: every chain draws `jitter_max_retries` candidate
    jitters at once and takes the first finite one — no Python retry loop.
    """
    base = _base_point(model, key, overrides)
    names = list(base.keys())

    if not jitter:
        return {k: jnp.broadcast_to(v, (chains,) + jnp.shape(v)) for k, v in base.items()}

    if logp_fn is None:
        logp_fn = model.logp_fn()

    def candidate(k):
        out = {}
        for i, n in enumerate(names):
            v = base[n]
            if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                u = jax.random.uniform(
                    jax.random.fold_in(k, i),
                    jnp.shape(v),
                    minval=-jitter,
                    maxval=jitter,
                    dtype=floatX(),
                )
                out[n] = v + u
            else:
                out[n] = v
        return out

    def select(cands, lps):
        # cands: {name: (chains, retries, ...)}; pick first finite per chain
        finite = jnp.isfinite(lps)
        idx = jnp.argmax(finite, axis=1)  # (chains,)
        any_finite = jnp.any(finite, axis=1)
        out = {}
        for n in names:
            picked = jnp.take_along_axis(
                cands[n],
                idx.reshape((-1, 1) + (1,) * (cands[n].ndim - 2)),
                axis=1,
            )[:, 0]
            flag = jnp.reshape(any_finite, (-1,) + (1,) * (picked.ndim - 1))
            out[n] = jnp.where(flag, picked, base[n])
        return out

    # one FLAT vmap over chains*retries (a nested vmap compiles far slower)
    def build(keys_flat):
        cands = jax.vmap(candidate)(keys_flat)
        lps = jax.vmap(logp_fn)(cands)
        cands = {
            n: v.reshape((chains, jitter_max_retries) + v.shape[1:])
            for n, v in cands.items()
        }
        return select(cands, lps.reshape(chains, jitter_max_retries))

    keys = jax.random.split(key, chains * jitter_max_retries)
    return jax.jit(build)(keys)
