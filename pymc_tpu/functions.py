"""Functional density/sampling API.

Parity: reference pymc/logprob/basic.py:105,206,307,372 (pm.logp, pm.logcdf,
pm.logccdf, pm.icdf) and pymc/sampling/forward.py:397 (pm.draw) — here these
dispatch directly on Distribution objects / RV nodes instead of rewriting a
graph IR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distributions.distribution import Distribution
from .graph import FreeRV, Node, ObservedRV

__all__ = ["logp", "logcdf", "logccdf", "icdf", "draw"]


def _dist_of(rv, env=None):
    if isinstance(rv, Distribution):
        return rv
    if isinstance(rv, (FreeRV, ObservedRV)):
        return rv.dist
    if isinstance(rv, Node):
        # invertible elementwise-op chain over a single RV leaf gets a
        # derived change-of-variables density (reference
        # logprob/transforms.py MeasurableTransform rewrites). RVs named in
        # the evaluation env are CONDITIONED ON — constants of this density,
        # exactly like the reference's conditional_logp treats every other
        # value-mapped RV (logprob/basic.py:206).
        from .distributions.transformed import (
            conditioned_on,
            dist_from_expression,
        )

        with conditioned_on(env.keys() if isinstance(env, dict) else ()):
            return dist_from_expression(rv)
    raise TypeError(
        f"Expected a Distribution or random-variable node, got {type(rv).__name__}. "
        "Derived-expression densities cover invertible elementwise transforms "
        "of one RV; anything else is expressed via explicit combinators "
        "(Censored, Truncated, Mixture, CustomDist) in this framework."
    )


def logp(rv, value, **kwargs):
    return _dist_of(rv, kwargs.get("env")).logp(value, **kwargs)


def logcdf(rv, value, **kwargs):
    return _dist_of(rv, kwargs.get("env")).logcdf(value, **kwargs)


def logccdf(rv, value, **kwargs):
    return _dist_of(rv, kwargs.get("env")).logccdf(value, **kwargs)


def icdf(rv, q, **kwargs):
    return _dist_of(rv, kwargs.get("env")).icdf(q, **kwargs)


def draw(rv, draws=1, random_seed=None, **kwargs):
    """Draw samples from distributions / RV nodes (reference forward.py:397).
    Accepts a single var or a list of vars (returns a list)."""
    if isinstance(random_seed, jax.Array) and random_seed.dtype == jnp.uint32:
        key = random_seed
    else:
        key = jax.random.PRNGKey(0 if random_seed is None else int(random_seed))
    if isinstance(rv, (list, tuple)):
        return [
            draw(r, draws=draws, random_seed=jax.random.fold_in(key, i), **kwargs)
            for i, r in enumerate(rv)
        ]
    if isinstance(rv, Node) and not isinstance(rv, (FreeRV, ObservedRV)):
        # arbitrary graph expression (e.g. a Deterministic): sample its RV
        # ancestors in dependency order and evaluate (reference draw()
        # compiles a forward fn over any variables, forward.py:397)
        return _draw_expression(rv, key, draws)
    dist = _dist_of(rv)
    sample_shape = () if draws == 1 else (draws,)
    return dist.sample(key, sample_shape, **kwargs)


def _draw_expression(node, key, draws):
    from .graph import _parents, ancestors, evaluate, rv_ancestors

    rvs = rv_ancestors([node])
    deps = {
        id(rv): [
            a for a in ancestors(list(_parents(rv)))
            if isinstance(a, (FreeRV, ObservedRV)) and a is not rv
        ]
        for rv in rvs
    }
    order, placed = [], set()
    while len(order) < len(rvs):
        progressed = False
        for rv in rvs:
            if id(rv) in placed:
                continue
            if all(id(d) in placed for d in deps[id(rv)]):
                order.append(rv)
                placed.add(id(rv))
                progressed = True
        if not progressed:  # pragma: no cover - DAG by construction
            raise RuntimeError("cyclic RV dependencies in draw()")

    def one(k):
        env, memo = {}, {}
        for i, rv in enumerate(order):
            env[rv.name] = rv.dist.sample(
                jax.random.fold_in(k, i), (), env, memo
            )
        return evaluate(node, env, memo)

    if draws == 1:
        return one(key)
    return jax.vmap(one)(jax.random.split(key, draws))
