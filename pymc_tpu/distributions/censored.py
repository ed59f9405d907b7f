"""Censored distribution combinator.

Parity: reference pymc/distributions/censored.py:79 (Censored) with the logp
semantics of pymc/logprob/censoring.py:86 (MeasurableClip): interval-censored
values accumulate the CDF mass at the bounds.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX, intX
from ..graph import evaluate
from ..math import _log1mexp_jax
from .distribution import Distribution, as_param

__all__ = ["Censored"]


class Censored(Distribution):
    """clip(base, lower, upper): P(X = lower) = F(lower),
    P(X = upper) = 1 - F(upper^-)."""

    param_names = ("lower", "upper")

    def __dist_init__(self, dist, lower=None, upper=None):
        if not isinstance(dist, Distribution):
            raise ValueError("Censored(dist=...) requires a .dist() instance")
        if dist.event_ndim != 0:
            raise NotImplementedError("Censoring supports univariate base dists")
        self.base = dist
        self.lower = as_param(lower) if lower is not None else None
        self.upper = as_param(upper) if upper is not None else None
        self.is_discrete = dist.is_discrete

    @property
    def support(self):
        # NO default transform (reference registers none for CensoredRV):
        # the density has point masses AT lower/upper, which an interval
        # transform could never reach — a transformed free Censored RV
        # would silently lose its boundary atoms
        return "real"

    @support.setter
    def support(self, v):
        pass

    def _interval_bounds(self):
        return self.lower, self.upper

    def _gathered(self, shape, idx, batch_shape, extra_event=()):
        from .distribution import _gather_batch_param

        base = self.base._gathered(shape, idx, batch_shape)
        kwargs = {}
        if self.lower is not None:
            kwargs["lower"] = _gather_batch_param(self.lower, batch_shape, idx)
        if self.upper is not None:
            kwargs["upper"] = _gather_batch_param(self.upper, batch_shape, idx)
        return type(self).dist(base, shape=shape, **kwargs)

    def _resolve_shapes(self):
        from .distribution import _shape_of

        nat = tuple(
            np.broadcast_shapes(
                self.base.shape,
                _shape_of(self.lower) if self.lower is not None else (),
                _shape_of(self.upper) if self.upper is not None else (),
            )
        )
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg)
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat
        self.batch_shape = batch
        self.event_shape = ()

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        base_lp = self.base.logp(value, env, memo)
        res = base_lp
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            if self.is_discrete:
                lo_mass = self.base.logcdf(lower, env, memo)
            else:
                lo_mass = self.base.logcdf(lower, env, memo)
            res = jnp.where(value == lower, lo_mass, res)
            res = jnp.where(value < lower, -jnp.inf, res)
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            if self.is_discrete:
                # P(X >= upper) = 1 - F(upper - 1)
                hi_mass = _log1mexp_jax(
                    jnp.minimum(self.base.logcdf(upper - 1, env, memo), -1e-15)
                )
            else:
                hi_mass = self.base.logccdf(upper, env, memo)
            res = jnp.where(value == upper, hi_mass, res)
            res = jnp.where(value > upper, -jnp.inf, res)
        return res

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        res = self.base.logcdf(value, env, memo)
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            res = jnp.where(value < lower, -jnp.inf, res)
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            res = jnp.where(value >= upper, 0.0, res)
        return res

    def icdf(self, q, env=None, memo=None):
        """Quantiles: the point masses at the bounds absorb the tail
        quantiles (q <= F(lower) -> lower, q >= F(upper^-) -> upper), which
        is exactly clip(base.icdf(q), lower, upper); NaN outside [0, 1]
        propagates through the clip. Reference logprob/censoring.py clip
        icdf semantics (tests/logprob/test_censoring.py:447)."""
        if memo is None:
            memo = {}
        base_q = self.base.icdf(q, env, memo)
        lo = evaluate(self.lower, env, memo) if self.lower is not None else None
        hi = evaluate(self.upper, env, memo) if self.upper is not None else None
        return jnp.clip(base_q, lo, hi)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        full = tuple(sample_shape) + self.shape
        extra = full[: len(full) - len(self.base.shape)] if self.base.shape else full
        draw = self.base.sample(key, extra, env, memo)
        lo = evaluate(self.lower, env, memo) if self.lower is not None else None
        hi = evaluate(self.upper, env, memo) if self.upper is not None else None
        draw = jnp.clip(draw, lo, hi)
        return jnp.broadcast_to(draw, full).astype(draw.dtype)

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        pt = self.base.support_point(env, memo)
        lo = evaluate(self.lower, env, memo) if self.lower is not None else None
        hi = evaluate(self.upper, env, memo) if self.upper is not None else None
        pt = jnp.clip(pt, lo, hi)
        return jnp.broadcast_to(pt, self.shape)
