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


def _dist_of(rv):
    if isinstance(rv, Distribution):
        return rv
    if isinstance(rv, (FreeRV, ObservedRV)):
        return rv.dist
    raise TypeError(
        f"Expected a Distribution or random-variable node, got {type(rv).__name__}. "
        "Derived-expression densities are expressed via explicit combinators "
        "(Censored, Truncated, Mixture, CustomDist) in this framework."
    )


def logp(rv, value, **kwargs):
    return _dist_of(rv).logp(value, **kwargs)


def logcdf(rv, value, **kwargs):
    return _dist_of(rv).logcdf(value, **kwargs)


def logccdf(rv, value, **kwargs):
    return _dist_of(rv).logccdf(value, **kwargs)


def icdf(rv, q, **kwargs):
    return _dist_of(rv).icdf(q, **kwargs)


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
    dist = _dist_of(rv)
    sample_shape = () if draws == 1 else (draws,)
    return dist.sample(key, sample_shape, **kwargs)
