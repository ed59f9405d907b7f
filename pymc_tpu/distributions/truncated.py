"""Truncated distribution combinator.

Parity: reference pymc/distributions/truncated.py:279 (Truncated): logp is
the base logp minus the log normalizer; sampling uses the inverse-CDF method
when an icdf exists (our generic on-device bisection solver otherwise covers
every distribution with a logcdf, replacing the reference's rejection loop
with max_n_steps + TruncationError, truncated.py:308-321).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX, intX
from ..graph import evaluate
from ..math import _log1mexp_jax
from .distribution import Distribution, as_param

__all__ = ["Truncated"]


class Truncated(Distribution):
    param_names = ("lower", "upper")

    def __dist_init__(self, dist, lower=None, upper=None):
        if not isinstance(dist, Distribution):
            raise ValueError("Truncated(dist=...) requires a .dist() instance")
        if dist.event_ndim != 0:
            raise NotImplementedError("Truncation supports univariate base dists")
        if lower is None and upper is None:
            raise ValueError("Truncated requires lower and/or upper")
        self.base = dist
        self.lower = as_param(lower) if lower is not None else None
        self.upper = as_param(upper) if upper is not None else None
        self.is_discrete = dist.is_discrete

    @property
    def support(self):
        return "interval" if not self.is_discrete else "discrete"

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

    def _log_norm(self, env, memo):
        """log(F(upper) - F(lower^-)); discrete lower uses F(lower-1)."""
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            hi = self.base.logcdf(upper, env, memo)
        else:
            hi = jnp.zeros((), dtype=floatX())
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            lo_arg = lower - 1 if self.is_discrete else lower
            lo = self.base.logcdf(lo_arg, env, memo)
            return hi + _log1mexp_jax(jnp.minimum(lo - hi, -1e-15))
        return hi

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        res = self.base.logp(value, env, memo) - self._log_norm(env, memo)
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            res = jnp.where(value < lower, -jnp.inf, res)
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            res = jnp.where(value > upper, -jnp.inf, res)
        return res

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        hi = self.base.logcdf(value, env, memo)
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            lo_arg = lower - 1 if self.is_discrete else lower
            lo = self.base.logcdf(lo_arg, env, memo)
            num = hi + _log1mexp_jax(jnp.minimum(lo - hi, -1e-15))
        else:
            num = hi
        res = jnp.minimum(num - self._log_norm(env, memo), 0.0)
        if self.lower is not None:
            res = jnp.where(value < evaluate(self.lower, env, memo), -jnp.inf, res)
        if self.upper is not None:
            res = jnp.where(value >= evaluate(self.upper, env, memo), 0.0, res)
        return res

    def icdf(self, q, env=None, memo=None):
        if memo is None:
            memo = {}
        q = jnp.asarray(q, dtype=floatX())
        lo_u = jnp.zeros((), floatX())
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            lo_arg = lower - 1 if self.is_discrete else lower
            lo_u = jnp.exp(self.base.logcdf(lo_arg, env, memo))
        hi_u = jnp.ones((), floatX())
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            hi_u = jnp.exp(self.base.logcdf(upper, env, memo))
        return self.base.icdf(lo_u + q * (hi_u - lo_u), env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        """Inverse-CDF sampling in the CDF domain — exact and rejection-free
        for any base with an icdf; falls back to the generic bisection icdf."""
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        full = tuple(sample_shape) + self.shape
        eps = jnp.finfo(floatX()).eps
        u = jax.random.uniform(
            key, full, dtype=floatX(), minval=eps, maxval=1.0 - eps
        )
        # map u into the truncated CDF domain [F(lo^-), F(hi)]
        lo_u = jnp.zeros((), floatX())
        if self.lower is not None:
            lower = evaluate(self.lower, env, memo)
            lo_arg = lower - 1 if self.is_discrete else lower
            lo_u = jnp.exp(self.base.logcdf(lo_arg, env, memo))
        hi_u = jnp.ones((), floatX())
        if self.upper is not None:
            upper = evaluate(self.upper, env, memo)
            hi_u = jnp.exp(self.base.logcdf(upper, env, memo))
        u_mapped = jnp.clip(lo_u + u * (hi_u - lo_u), eps, 1.0 - eps)
        try:
            draw = self.base.icdf(u_mapped, env, memo)
        except NotImplementedError:
            if not self.is_discrete:
                raise
            draw = self._icdf_discrete_scan(u_mapped, env, memo)
        if self.is_discrete:
            # icdf of continuous-relaxed cdf -> ceil to the discrete support
            draw = jnp.ceil(draw - 1e-9)
            lo = evaluate(self.lower, env, memo) if self.lower is not None else None
            hi = evaluate(self.upper, env, memo) if self.upper is not None else None
            draw = jnp.clip(draw, lo, hi)
            return jnp.asarray(draw, intX())
        return jnp.asarray(draw, floatX())

    def _icdf_discrete_scan(self, u, env, memo):
        """Discrete quantile via monotone bisection on integers."""
        logu = jnp.log(u)
        lo = jnp.full(u.shape, -1.0, floatX())
        hi = jnp.full(u.shape, 1.0, floatX())

        # static-budget bracket growth
        for _ in range(40):
            mask = self.base.logcdf(hi, env, memo) < logu
            hi = jnp.where(mask, hi * 2.0, hi)

        def body(_, st):
            lo, hi = st
            mid = jnp.floor((lo + hi) / 2.0)
            c = self.base.logcdf(mid, env, memo)
            lt = c < logu
            return jnp.where(lt, mid, lo), jnp.where(lt, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 60, body, (lo, hi))
        return hi

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        pt = self.base.support_point(env, memo).astype(floatX())
        if self.lower is not None:
            lo = evaluate(self.lower, env, memo)
            pt = jnp.maximum(pt, lo + (0 if self.is_discrete else 1.0))
        if self.upper is not None:
            hi = evaluate(self.upper, env, memo)
            pt = jnp.minimum(pt, hi - (0 if self.is_discrete else 1.0))
        if self.lower is not None and self.upper is not None:
            lo = evaluate(self.lower, env, memo)
            hi = evaluate(self.upper, env, memo)
            pt = jnp.clip(pt, lo, hi)
            mid = (jnp.asarray(lo, floatX()) + hi) / 2.0
            pt = jnp.where((pt <= lo) | (pt >= hi), mid, pt)
        if self.is_discrete:
            return jnp.broadcast_to(jnp.round(pt).astype(intX()), self.shape)
        return jnp.broadcast_to(pt, self.shape)
