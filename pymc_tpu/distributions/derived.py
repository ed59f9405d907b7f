"""Derived-density combinators: discretization, order statistics, cumulative
sums, and comparisons of random variables.

Parity: these are the remaining observed-expression capabilities of the
reference's graph-rewrite logprob engine, redesigned (per SURVEY §2.2 TPU
mapping) as explicit distribution combinators instead of rewrites:

- Discretized      <- pymc/logprob/censoring.py:299-420 (MeasurableRound:
                      round/floor/ceil/trunc of a continuous RV)
- OrderStatistic,
  Max, Min         <- pymc/logprob/order.py:70-172 (max/min of iid RVs,
                      continuous closed form and discrete CDF-power form)
- CumSum           <- pymc/logprob/cumsum.py:53-75 (diff-transform, unit
                      Jacobian)
- Compared         <- pymc/logprob/binary.py:92-122 (rv > c observed as a
                      Bernoulli with CDF/CCDF masses, incl. the discrete
                      boundary corrections for GE/LT)

All logps are closed-form jnp expressions — they fuse into the model's single
XLA logp program; no graph rewriting happens at runtime.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..config import floatX, intX
from ..graph import evaluate
from ..math import _log1mexp_jax
from .distribution import Continuous, Discrete, Distribution, as_param

__all__ = ["Discretized", "OrderStatistic", "Max", "Min", "CumSum", "Compared"]


def _logdiffexp(a, b):
    """log(exp(a) - exp(b)) for a >= b, stable."""
    return a + _log1mexp_jax(jnp.minimum(b - a, -jnp.finfo(floatX()).tiny))


class Discretized(Discrete):
    """Distribution of ``method(X)`` for a continuous base X, where method is
    round / floor / ceil / trunc.

    P(round(X) = k) = F(k + 1/2) - F(k - 1/2)
    P(floor(X) = k) = F(k + 1)   - F(k)
    P(ceil(X)  = k) = F(k)       - F(k - 1)
    P(trunc(X) = k) = rounded-down mass for k > 0, rounded-up for k < 0, and
                      the pooled (-1, 1) cell at k = 0.

    Reference semantics: pymc/logprob/censoring.py:343-420 (round_logprob).
    """

    param_names = ()
    _methods = ("round", "floor", "ceil", "trunc")

    def __dist_init__(self, dist, method="round"):
        if not isinstance(dist, Distribution):
            raise ValueError("Discretized(dist=...) requires a .dist() instance")
        if dist.is_discrete:
            # Rounding an integer-supported RV is the identity (reference
            # find_measurable_roundings reduces it to a cast).
            raise ValueError(
                "Discretized requires a continuous base distribution; "
                f"{type(dist).__name__} is already discrete"
            )
        if dist.event_ndim != 0:
            raise NotImplementedError(
                "Discretized supports univariate base distributions"
            )
        if method not in self._methods:
            raise ValueError(f"method must be one of {self._methods}")
        self.base = dist
        self.method = method

    def _resolve_shapes(self):
        batch = tuple(self.base.shape)
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg)
        elif self._size_arg is not None:
            batch = self._size_arg
        self.batch_shape = batch
        self.event_shape = ()

    def _cell_bounds(self, value):
        """(snapped value, lower edge, upper edge) of the cell `value` maps to."""
        v = jnp.asarray(value, dtype=floatX())
        if self.method == "round":
            v = jnp.round(v)
            return v, v - 0.5, v + 0.5
        if self.method == "floor":
            v = jnp.floor(v)
            return v, v, v + 1.0
        if self.method == "ceil":
            v = jnp.ceil(v)
            return v, v - 1.0, v
        # trunc: [k, k+1) for k >= 0, (k-1, k] for k < 0, (-1, 1) pooled at 0
        v = jnp.trunc(v)
        return v, v - (v <= 0), v + (v >= 0)

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        _, lo, hi = self._cell_bounds(value)
        return _logdiffexp(
            self.base.logcdf(hi, env, memo), self.base.logcdf(lo, env, memo)
        )

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        v, _, hi = self._cell_bounds(value)
        if self.method == "trunc":
            # trunc(X) <= k  <=>  X < k+1 for k >= 0, X <= k for k < 0
            hi = v + (v >= 0)
        return self.base.logcdf(hi, env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        full = tuple(sample_shape) + self.shape
        extra = full[: len(full) - len(self.base.shape)]
        draw = self.base.sample(key, extra, env, memo)
        fn = {"round": jnp.round, "floor": jnp.floor,
              "ceil": jnp.ceil, "trunc": jnp.trunc}[self.method]
        return jnp.broadcast_to(fn(draw), full).astype(intX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        pt, _, _ = self._cell_bounds(self.base.support_point(env, memo))
        return jnp.broadcast_to(pt, self.shape).astype(intX())


class OrderStatistic(Distribution):
    """Distribution of the k-th smallest of ``n`` iid draws from ``dist``
    (1-indexed rank: k=1 is the minimum, k=n the maximum).

    Continuous closed form (reference pymc/logprob/order.py:142-152 for the
    max special case, generalized to arbitrary rank):

        logp(x) = log n! - log (k-1)! - log (n-k)!
                  + (k-1) logF(x) + (n-k) logS(x) + logf(x)

    Discrete max/min use the CDF-power difference form
    (pymc/logprob/order.py:156-172); other discrete ranks are not supported.
    """

    param_names = ()

    def __dist_init__(self, dist, n, rank):
        if not isinstance(dist, Distribution):
            raise ValueError("OrderStatistic(dist=...) requires a .dist() instance")
        if dist.event_ndim != 0 or tuple(dist.shape) != ():
            raise ValueError(
                "OrderStatistic requires a scalar (iid) base distribution; "
                "got batch shape %r" % (dist.shape,)
            )
        n = int(n)
        rank = int(rank)
        if not 1 <= rank <= n:
            raise ValueError(f"rank must be in [1, {n}]; got {rank}")
        if dist.is_discrete and rank not in (1, n):
            raise NotImplementedError(
                "Discrete order statistics are only supported for the "
                "minimum (rank=1) and maximum (rank=n)"
            )
        self.base = dist
        self.n = n
        self.rank = rank
        self.is_discrete = dist.is_discrete

    @property
    def support(self):
        return self.base.support

    @support.setter
    def support(self, v):
        pass

    def _interval_bounds(self):
        return self.base._interval_bounds()

    def _resolve_shapes(self):
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg)
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = ()
        self.batch_shape = batch
        self.event_shape = ()

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        n, k = self.n, self.rank
        if self.is_discrete:
            F = self.base.logcdf(value, env, memo)
            F_prev = self.base.logcdf(value - 1, env, memo)
            if k == n:  # max: F(x)^n - F(x-1)^n
                return _logdiffexp(n * F, n * F_prev)
            # min: S(x-1)^n - S(x)^n with S(x) = P(X > x)
            S = _log1mexp_jax(jnp.minimum(F, -jnp.finfo(floatX()).tiny))
            S_prev = _log1mexp_jax(
                jnp.minimum(F_prev, -jnp.finfo(floatX()).tiny)
            )
            return _logdiffexp(n * S_prev, n * S)
        logF = self.base.logcdf(value, env, memo)
        logS = self.base.logccdf(value, env, memo)
        logf = self.base.logp(value, env, memo)
        coef = (
            gammaln(n + 1.0) - gammaln(float(k)) - gammaln(n - k + 1.0)
        )
        return coef + (k - 1) * logF + (n - k) * logS + logf

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        n, k = self.n, self.rank
        F = self.base.logcdf(value, env, memo)
        if k == n:  # P(max <= x) = F^n
            return n * F
        if k == 1:  # P(min <= x) = 1 - S^n
            S = _log1mexp_jax(jnp.minimum(F, -jnp.finfo(floatX()).tiny))
            return _log1mexp_jax(jnp.minimum(n * S, -jnp.finfo(floatX()).tiny))
        raise NotImplementedError(
            "logcdf of interior order statistics is not implemented"
        )

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        full = tuple(sample_shape) + self.shape
        draws = self.base.sample(key, full + (self.n,), env, memo)
        srt = jnp.sort(draws, axis=-1)
        return srt[..., self.rank - 1]

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        # quantile heuristic: base icdf at k/(n+1) when available
        try:
            q = jnp.asarray(self.rank / (self.n + 1.0), dtype=floatX())
            pt = self.base.icdf(jnp.broadcast_to(q, self.base.shape), env, memo)
        except NotImplementedError:
            pt = self.base.support_point(env, memo)
        return jnp.broadcast_to(jnp.asarray(pt, self.dtype), self.shape)


class Max(OrderStatistic):
    """Maximum of n iid draws (reference logprob/order.py max_logprob)."""

    def __dist_init__(self, dist, n):
        super().__dist_init__(dist, n, int(n))


class Min(OrderStatistic):
    """Minimum of n iid draws (reference logprob/order.py via negated max)."""

    def __dist_init__(self, dist, n):
        super().__dist_init__(dist, n, 1)


class CumSum(Continuous):
    """Distribution of cumsum(X, axis) for a base distribution of independent
    components. The map is unit-lower-triangular, so |det J| = 1 and
    logp(v) = base.logp(diff_with_first(v)) (reference logprob/cumsum.py:53).
    """

    param_names = ()

    def __dist_init__(self, dist, axis=-1):
        if not isinstance(dist, Distribution):
            raise ValueError("CumSum(dist=...) requires a .dist() instance")
        if dist.is_discrete:
            self.is_discrete = True
        if dist.ndim == 0:
            raise ValueError("CumSum requires a base with at least one axis")
        self.base = dist
        self.axis = int(axis)

    def _resolve_shapes(self):
        self.batch_shape = tuple(self.base.shape)
        self.event_shape = ()
        if self._shape_arg is not None and tuple(self._shape_arg) != self.batch_shape:
            raise ValueError(
                f"CumSum shape must match the base shape {self.batch_shape}"
            )
        if self._size_arg is not None:
            # silently ignoring size= would return wrongly-shaped draws
            raise ValueError(
                "CumSum does not take size=; give the BASE distribution the "
                "desired shape (the cumsum axis lives on the base)"
            )

    def _diff(self, value):
        first = jnp.take(value, jnp.asarray([0]), axis=self.axis)
        return jnp.concatenate(
            [first, jnp.diff(value, axis=self.axis)], axis=self.axis
        )

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = self._cast_value(value)
        return self.base.logp(self._diff(value), env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        draw = self.base.sample(key, sample_shape, env, memo)
        return jnp.cumsum(draw, axis=self.axis).astype(draw.dtype)

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        pt = jnp.broadcast_to(self.base.support_point(env, memo), self.shape)
        return jnp.cumsum(pt, axis=self.axis)

    def _cast_value(self, value):
        value = jnp.asarray(value)
        if not jnp.issubdtype(value.dtype, jnp.floating) and not self.is_discrete:
            value = value.astype(floatX())
        return value


class Compared(Discrete):
    """Distribution of the boolean ``X <op> c`` for base RV X and a constant
    (or graph-node) operand c — observing whether a latent crossed a
    threshold. op in {">", ">=", "<", "<="}.

    Continuous: P(True) = S(c) for >/>=, F(c) for </<=.
    Discrete boundary corrections follow reference logprob/binary.py:92-122:
      >  : True -> S(c),             False -> F(c)
      >= : True -> S(c) + p(c),      False -> F(c-1)
      <  : True -> F(c-1),           False -> S(c) + p(c)
      <= : True -> F(c),             False -> S(c)
    where S(c) = P(X > c).
    """

    param_names = ("operand",)
    _ops = (">", ">=", "<", "<=")

    def __dist_init__(self, dist, operand, op=">"):
        if not isinstance(dist, Distribution):
            raise ValueError("Compared(dist=...) requires a .dist() instance")
        if dist.event_ndim != 0:
            raise NotImplementedError("Compared supports univariate base dists")
        if op not in self._ops:
            raise ValueError(f"op must be one of {self._ops}")
        self.base = dist
        self.op = op
        self.operand = as_param(operand, float_ok=not dist.is_discrete)

    def _resolve_shapes(self):
        from .distribution import _shape_of

        nat = tuple(np.broadcast_shapes(self.base.shape, _shape_of(self.operand)))
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg)
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat
        self.batch_shape = batch
        self.event_shape = ()

    def _masses(self, env, memo):
        """(log P(True), log P(False)) elementwise over the batch."""
        c = evaluate(self.operand, env, memo)
        F = self.base.logcdf(c, env, memo)
        S = self.base.logccdf(c, env, memo)
        op = self.op
        if not self.base.is_discrete:
            if op in (">", ">="):
                return S, F
            return F, S
        p = self.base.logp(c, env, memo)
        F_prev = self.base.logcdf(c - 1, env, memo)
        if op == ">":
            return S, F
        if op == ">=":
            return jnp.logaddexp(S, p), F_prev
        if op == "<":
            return F_prev, jnp.logaddexp(S, p)
        return F, S  # <=

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        value = jnp.asarray(value)
        lt, lf = self._masses(env, memo)
        vt = value != 0
        res = jnp.where(vt, lt, lf)
        # values outside {0, 1} have no mass
        is_binary = (value == 0) | (value == 1)
        return jnp.where(is_binary, res, -jnp.inf)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        full = tuple(sample_shape) + self.shape
        extra = full[: len(full) - len(self.base.shape)]
        draw = self.base.sample(key, extra, env, memo)
        c = evaluate(self.operand, env, memo)
        fn = {">": jnp.greater, ">=": jnp.greater_equal,
              "<": jnp.less, "<=": jnp.less_equal}[self.op]
        return jnp.broadcast_to(fn(draw, c), full).astype(intX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        lt, _ = self._masses(env, memo)
        pt = (jnp.exp(lt) > 0.5).astype(intX())
        return jnp.broadcast_to(pt, self.shape)
