"""Discrete distributions.

Parity: reference pymc/distributions/discrete.py (Binomial:73,
BetaBinomial:178, Bernoulli:296, DiscreteWeibull:430, Poisson:522,
NegativeBinomial:618, Geometric:765, HyperGeometric:859, DiscreteUniform:1000,
Categorical:1099, OrderedLogistic:1231, OrderedProbit:1329).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..config import floatX, intX
from ..graph import apply, is_node
from .dist_math import (
    betaln,
    binomln,
    check_parameters,
    factln,
    logpow,
    normal_lcdf,
)
from .distribution import Discrete, as_param

__all__ = [
    "Binomial", "BetaBinomial", "Bernoulli", "DiscreteWeibull", "Poisson",
    "NegativeBinomial", "Geometric", "HyperGeometric", "DiscreteUniform",
    "Categorical", "OrderedLogistic", "OrderedProbit",
]


def _log1mexp(x):
    from ..math import _log1mexp_jax

    return _log1mexp_jax(x)


def _sigmoid_logit(p):
    """Return the logit node when `p` is sigmoid(z) in the graph, else None.

    The reference keeps log(p)/log1p(-p) finite for p = sigmoid(a) via its
    sigmoid-introduction logp rewrites (pymc/logprob/rewriting.py pipeline);
    here the sigmoid head is matched once at dist construction and the
    density uses the stable -softplus(∓z) forms
    (reference tests/distributions/test_discrete.py
    ::test_negative_binomial_logp_stable_when_p_underflows)."""
    from ..graph import DeterministicNode

    if (
        isinstance(p, DeterministicNode)
        and not p.kwargs
        and len(p.args) == 1
        and p.fn in (jax.nn.sigmoid, jsp.expit)
    ):
        return p.args[0]
    return None


def _xlogy0(m, logx):
    """m * logx with the logpow convention 0 * (-inf) := 0."""
    return jnp.where(m == 0, 0.0, m * logx)


class Binomial(Discrete):
    """Reference discrete.py:73."""

    param_names = ("n", "p")
    aux_param_names = ("logit_p",)

    def __dist_init__(self, n, p=None, logit_p=None):
        if p is not None and logit_p is not None:
            raise ValueError(
                "Incompatible parametrization. Can't specify both p and logit_p."
            )
        if p is None and logit_p is None:
            raise ValueError(
                "Incompatible parametrization. Must specify either p or logit_p."
            )
        self.n = as_param(n, float_ok=False)
        if p is None:
            self.logit_p = as_param(logit_p)
            p = apply(jax.nn.sigmoid, self.logit_p)
        else:
            self.logit_p = _sigmoid_logit(p)
        self.p = as_param(p)

    def _logp(self, value, n, p, logit_p=None):
        if logit_p is not None:
            res = (
                binomln(n, value)
                + _xlogy0(value, -jax.nn.softplus(-logit_p))
                + _xlogy0(n - value, -jax.nn.softplus(logit_p))
            )
            res = jnp.where((value >= 0) & (value <= n), res, -jnp.inf)
            return check_parameters(res, n >= 0)
        res = (
            binomln(n, value)
            + logpow(p, value)
            + logpow(1.0 - p, n - value)
        )
        res = jnp.where((value >= 0) & (value <= n), res, -jnp.inf)
        return check_parameters(res, n >= 0, p >= 0, p <= 1)

    def _logcdf(self, value, n, p, logit_p=None):
        v = jnp.floor(value)
        safe_v = jnp.clip(v, 0, n)
        # CDF(k) = I_{1-p}(n-k, k+1) (regularized incomplete beta)
        from .dist_math import safe_log

        res = safe_log(jsp.betainc(jnp.maximum(n - safe_v, 1e-12), safe_v + 1.0, 1.0 - p))
        res = jnp.where(v < 0, -jnp.inf, jnp.where(v >= n, 0.0, res))
        return check_parameters(res, n >= 0, p >= 0, p <= 1)

    def _sample(self, key, shape, n, p):
        return jax.random.binomial(
            key, jnp.asarray(n, floatX()), jnp.asarray(p, floatX()), shape=shape
        ).astype(intX())

    def _support_point(self, n, p):
        return jnp.round(n * p).astype(intX())


class BetaBinomial(Discrete):
    """Reference discrete.py:178."""

    param_names = ("n", "alpha", "beta")

    def __dist_init__(self, alpha, beta, n):
        self.n = as_param(n, float_ok=False)
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    def _logp(self, value, n, alpha, beta):
        res = (
            binomln(n, value)
            + betaln(value + alpha, n - value + beta)
            - betaln(alpha, beta)
        )
        res = jnp.where((value >= 0) & (value <= n), res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0, n >= 0)

    def _sample(self, key, shape, n, alpha, beta):
        k1, k2 = jax.random.split(key)
        p = jax.random.beta(k1, alpha, beta, shape=shape, dtype=floatX())
        return jax.random.binomial(k2, jnp.asarray(n, floatX()), p, shape=shape).astype(
            intX()
        )

    def _support_point(self, n, alpha, beta):
        return jnp.round(n * alpha / (alpha + beta)).astype(intX())


class Bernoulli(Discrete):
    """Reference discrete.py:296."""

    param_names = ("p",)
    aux_param_names = ("logit_p",)

    def __dist_init__(self, p=None, logit_p=None):
        if p is not None and logit_p is not None:
            raise ValueError(
                "Incompatible parametrization. Can't specify both p and logit_p."
            )
        if p is None and logit_p is None:
            raise ValueError(
                "Incompatible parametrization. Must specify either p or logit_p."
            )
        if p is None:
            self.logit_p = as_param(logit_p)
            p = apply(jax.nn.sigmoid, self.logit_p)
        else:
            self.logit_p = _sigmoid_logit(p)
        self.p = as_param(p)

    def _logp(self, value, p, logit_p=None):
        if logit_p is not None:
            res = jnp.where(
                value == 1,
                -jax.nn.softplus(-logit_p),
                -jax.nn.softplus(logit_p),
            )
            return jnp.where((value == 0) | (value == 1), res, -jnp.inf)
        from .dist_math import safe_log

        res = jnp.where(value == 1, safe_log(p), safe_log(1.0 - p))
        res = jnp.where((value == 0) | (value == 1), res, -jnp.inf)
        return check_parameters(res, p >= 0, p <= 1)

    def _logcdf(self, value, p, logit_p=None):
        if logit_p is not None:
            res = jnp.where(value >= 1, 0.0, -jax.nn.softplus(logit_p))
            return jnp.where(value < 0, -jnp.inf, res)
        from .dist_math import safe_log

        res = jnp.where(value >= 1, 0.0, safe_log(1.0 - p))
        res = jnp.where(value < 0, -jnp.inf, res)
        return check_parameters(res, p >= 0, p <= 1)

    def _icdf(self, q, p):
        return jnp.where(q <= 1.0 - p, 0, 1)

    def _sample(self, key, shape, p):
        return jax.random.bernoulli(key, jnp.asarray(p, floatX()), shape=shape).astype(
            intX()
        )

    def _support_point(self, p):
        return (p > 0.5).astype(intX())


class DiscreteWeibull(Discrete):
    """Reference discrete.py:430 (q, beta parametrization)."""

    param_names = ("q", "beta")

    def __dist_init__(self, q, beta):
        self.q = as_param(q)
        self.beta = as_param(beta)

    def _logp(self, value, q, beta):
        vf = jnp.asarray(value, floatX())
        safe = jnp.maximum(vf, 0.0)
        lq = jnp.log(q)
        a = lq * safe**beta
        b = lq * (safe + 1.0) ** beta
        res = a + _log1mexp(b - a)
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, q > 0, q < 1, beta > 0)

    def _logcdf(self, value, q, beta):
        vf = jnp.floor(jnp.asarray(value, floatX()))
        safe = jnp.maximum(vf, 0.0)
        res = _log1mexp(jnp.log(q) * (safe + 1.0) ** beta)
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, q > 0, q < 1, beta > 0)

    def _sample(self, key, shape, q, beta):
        u = jax.random.uniform(key, shape, dtype=floatX())
        # icdf: smallest k with 1 - q^{(k+1)^beta} >= u
        k = jnp.ceil((jnp.log1p(-u) / jnp.log(q)) ** (1.0 / beta) - 1.0)
        return jnp.maximum(k, 0.0).astype(intX())

    def _support_point(self, q, beta):
        # median = (log .5 / log q)^(1/beta) - 1, truncated by the int cast
        # (reference discrete.py DiscreteWeibull.support_point)
        k = (jnp.log(0.5) / jnp.log(q)) ** (1.0 / beta) - 1.0
        return jnp.maximum(jnp.floor(k), 0.0).astype(intX())


class Poisson(Discrete):
    """Reference discrete.py:522."""

    param_names = ("mu",)

    def __dist_init__(self, mu):
        self.mu = as_param(mu)

    def _logp(self, value, mu):
        vf = jnp.asarray(value, floatX())
        res = logpow(mu, vf) - factln(vf) - mu
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, mu >= 0)

    def _logcdf(self, value, mu):
        vf = jnp.floor(jnp.asarray(value, floatX()))
        safe = jnp.maximum(vf, 0.0)
        # CDF(k) = Q(k+1, mu) (regularized upper incomplete gamma)
        from .dist_math import safe_log

        res = safe_log(jsp.gammaincc(safe + 1.0, mu))
        res = jnp.where(value >= 0, res, -jnp.inf)
        # gammaincc(inf, mu) returns 0 rather than 1; CDF(+inf) is exactly 1
        res = jnp.where(value == jnp.inf, 0.0, res)
        return check_parameters(res, mu >= 0)

    def _sample(self, key, shape, mu):
        return jax.random.poisson(key, jnp.asarray(mu, floatX()), shape=shape).astype(
            intX()
        )

    def _support_point(self, mu):
        return jnp.floor(mu).astype(intX())


class NegativeBinomial(Discrete):
    """Reference discrete.py:618 (mu/alpha or p/n parametrization)."""

    param_names = ("n", "p")
    aux_param_names = ("logit_p", "mu")

    def __dist_init__(self, mu=None, alpha=None, p=None, n=None):
        n_, p_ = self.get_n_p(mu=mu, alpha=alpha, p=p, n=n)
        self.n = as_param(n_)
        self.p = as_param(p_)
        self.logit_p = _sigmoid_logit(self.p)
        # keep the ORIGINAL mu: materializing p = n/(mu+n) rounds to 1 at
        # huge n and mu cannot be recovered (the reference survives because
        # PyTensor symbolically cancels n*(1-p)/p back to mu)
        self.mu = as_param(mu) if (p is None and mu is not None) else None

    @classmethod
    def get_n_p(cls, mu=None, alpha=None, p=None, n=None):
        """Resolve the (mu, alpha)/(p, n) parametrizations — mixed pairs are
        valid; duplicate roles raise (reference discrete.py:703-721, exact
        messages)."""
        if n is None:
            if alpha is not None:
                n = alpha
            else:
                raise ValueError(
                    "Incompatible parametrization. Must specify either alpha or n."
                )
        elif alpha is not None:
            raise ValueError(
                "Incompatible parametrization. Can't specify both alpha and n."
            )
        if p is None:
            if mu is not None:
                p = apply(lambda nn, mm: nn / (mm + nn), as_param(n), as_param(mu))
            else:
                raise ValueError(
                    "Incompatible parametrization. Must specify either mu or p."
                )
        elif mu is not None:
            raise ValueError(
                "Incompatible parametrization. Can't specify both mu and p."
            )
        return n, p

    def _logp(self, value, n, p, logit_p=None, mu=None):
        from .dist_math import safe_log

        vf = jnp.asarray(value, floatX())
        if logit_p is not None:
            log_p = -jax.nn.softplus(-logit_p)
            log1m_p = -jax.nn.softplus(logit_p)
        elif mu is not None:
            # direct mu parametrization: stable for any n (p = n/(mu+n)
            # materialized would round to 1 at huge n)
            log_mu_n = jnp.log(mu + n)
            log_p = safe_log(n) - log_mu_n
            log1m_p = safe_log(mu) - log_mu_n
        else:
            log_p = safe_log(p)
            log1m_p = jnp.log1p(-p)
        # binomln subtracts gammaln(value + n) - gammaln(n), whose difference
        # falls below their shared ulp once n is large: fall back on the
        # Poisson(mu) limit there (reference discrete.py:731-738). The unused
        # branch must stay NaN-free under grad, hence the clipped exponent.
        mu_val = (
            mu
            if mu is not None
            else n * jnp.exp(jnp.clip(log1m_p - log_p, -700.0, 700.0))
        )
        poisson_res = logpow(mu_val, vf) - mu_val - factln(vf)
        nb_res = (
            binomln(vf + n - 1.0, vf)
            + _xlogy0(n, log_p)
            + _xlogy0(vf, log1m_p)
        )
        res = jnp.where(n > 1e10, poisson_res, nb_res)
        res = jnp.where(value >= 0, res, -jnp.inf)
        if logit_p is not None:
            return check_parameters(res, n > 0)
        if mu is not None:
            return check_parameters(res, n > 0, mu >= 0)
        # p == 0 is outside the support, but a valid tiny p can round to it
        # (sigmoid(-800) is exactly 0.0): 0 <= p keeps those usable at the
        # cost of the limiting -inf for a degenerate p == 0 (reference
        # discrete.py:740-748)
        return check_parameters(res, n > 0, p >= 0, p <= 1)

    def _logcdf(self, value, n, p, logit_p=None, mu=None):
        vf = jnp.floor(jnp.asarray(value, floatX()))
        safe = jnp.maximum(vf, 0.0)
        from .dist_math import safe_log

        res = safe_log(jsp.betainc(n, safe + 1.0, p))
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, n > 0, p >= 0, p <= 1)

    def _sample(self, key, shape, n, p):
        # gamma-poisson mixture
        k1, k2 = jax.random.split(key)
        g = jax.random.gamma(k1, n, shape=shape, dtype=floatX()) * (1.0 - p) / p
        return jax.random.poisson(k2, g, shape=shape).astype(intX())

    def _support_point(self, n, p):
        mu = n * (1.0 - p) / p
        return jnp.floor(mu).astype(intX())


class Geometric(Discrete):
    """Reference discrete.py:765 (support {1, 2, ...})."""

    param_names = ("p",)
    aux_param_names = ("logit_p",)

    def __dist_init__(self, p):
        self.p = as_param(p)
        self.logit_p = _sigmoid_logit(self.p)

    def _logp(self, value, p, logit_p=None):
        vf = jnp.asarray(value, floatX())
        if logit_p is not None:
            res = -jax.nn.softplus(-logit_p) + _xlogy0(
                vf - 1.0, -jax.nn.softplus(logit_p)
            )
            return jnp.where(value >= 1, res, -jnp.inf)
        res = jnp.log(p) + logpow(1.0 - p, vf - 1.0)
        res = jnp.where(value >= 1, res, -jnp.inf)
        return check_parameters(res, p > 0, p <= 1)

    def _logcdf(self, value, p, logit_p=None):
        vf = jnp.floor(jnp.asarray(value, floatX()))
        safe = jnp.maximum(vf, 1.0)
        log1m_p = (
            -jax.nn.softplus(logit_p) if logit_p is not None else jnp.log1p(-p)
        )
        res = _log1mexp(safe * log1m_p)
        res = jnp.where(value >= 1, res, -jnp.inf)
        if logit_p is not None:
            return res
        return check_parameters(res, p > 0, p <= 1)

    def _icdf(self, q, p):
        # ceil with a one-step back-off: float error in the ratio can land
        # just above the true integer (reference discrete.py:844 res_1m check)
        res = jnp.ceil(jnp.log1p(-q) / jnp.log1p(-p))
        res_1m = jnp.maximum(res - 1.0, 1.0)
        cdf_1m = jnp.exp(self._logcdf(res_1m, p))
        return jnp.where(cdf_1m >= q, res_1m, res).astype(intX())

    def _sample(self, key, shape, p):
        u = jax.random.uniform(key, shape, dtype=floatX())
        return jnp.maximum(
            jnp.ceil(jnp.log1p(-u) / jnp.log1p(-p)), 1.0
        ).astype(intX())

    def _support_point(self, p):
        return jnp.maximum(jnp.round(1.0 / p), 1.0).astype(intX())


class HyperGeometric(Discrete):
    """Reference discrete.py:859. N population, k successes, n draws."""

    param_names = ("N", "k", "n")

    def __dist_init__(self, N, k, n):
        self.N = as_param(N, float_ok=False)
        self.k = as_param(k, float_ok=False)
        self.n = as_param(n, float_ok=False)

    def _logp(self, value, N, k, n):
        vf = jnp.asarray(value, floatX())
        Nf = jnp.asarray(N, floatX())
        kf = jnp.asarray(k, floatX())
        nf = jnp.asarray(n, floatX())
        res = binomln(kf, vf) + binomln(Nf - kf, nf - vf) - binomln(Nf, nf)
        lower = jnp.maximum(0.0, nf - (Nf - kf))
        upper = jnp.minimum(kf, nf)
        res = jnp.where((vf >= lower) & (vf <= upper), res, -jnp.inf)
        return check_parameters(res, N >= 0, k >= 0, n >= 0, k <= N, n <= N)

    def _sample(self, key, shape, N, k, n):
        # sequential sampling via inverse CDF is O(n); use the count of
        # successes among n draws without replacement via Fisher-Yates-free
        # trick: sort n smallest of N uniform keys — O(N) per element is too
        # big; instead use the normal/binomial approximation... Here: exact
        # via logcdf-free cumulative scan over support (support is small for
        # typical use). Max support bound computed statically if concrete.
        Nf = jnp.asarray(N, floatX())
        kf = jnp.asarray(k, floatX())
        nf = jnp.asarray(n, floatX())
        kmax = int(np.asarray(jax.device_get(jnp.max(jnp.minimum(kf, nf)))))
        ks = jnp.arange(kmax + 1, dtype=floatX())
        shp = shape + (kmax + 1,)
        logp = (
            binomln(kf[..., None], ks)
            + binomln(Nf[..., None] - kf[..., None], nf[..., None] - ks)
            - binomln(Nf[..., None], nf[..., None])
        )
        lower = jnp.maximum(0.0, nf[..., None] - (Nf[..., None] - kf[..., None]))
        upper = jnp.minimum(kf[..., None], nf[..., None])
        logp = jnp.where((ks >= lower) & (ks <= upper), logp, -jnp.inf)
        return jax.random.categorical(key, jnp.broadcast_to(logp, shp)).astype(intX())

    def _support_point(self, N, k, n):
        Nf = jnp.asarray(N, floatX())
        return jnp.floor(
            jnp.asarray(n, floatX()) * jnp.asarray(k, floatX()) / Nf
        ).astype(intX())


class DiscreteUniform(Discrete):
    """Reference discrete.py:1000."""

    param_names = ("lower", "upper")

    def __dist_init__(self, lower, upper):
        self.lower = as_param(lower, float_ok=False)
        self.upper = as_param(upper, float_ok=False)

    def _logp(self, value, lower, upper):
        nf = jnp.asarray(upper - lower + 1, floatX())
        res = -jnp.log(nf)
        res = jnp.where((value >= lower) & (value <= upper), res, -jnp.inf)
        return check_parameters(res, lower <= upper)

    def _logcdf(self, value, lower, upper):
        vf = jnp.floor(jnp.asarray(value, floatX()))
        nf = jnp.asarray(upper - lower + 1, floatX())
        frac = (jnp.clip(vf, lower, upper) - lower + 1.0) / nf
        res = jnp.log(frac)
        res = jnp.where(vf < lower, -jnp.inf, jnp.where(vf >= upper, 0.0, res))
        return check_parameters(res, lower <= upper)

    def _icdf(self, q, lower, upper):
        # ceil with one-step back-off against float boundary error
        # (reference discrete.py:1084 res_1m check)
        nf = upper - lower + 1
        res = lower + jnp.ceil(q * nf) - 1
        res_1m = jnp.maximum(res - 1, lower)
        cdf_1m = jnp.exp(self._logcdf(res_1m, lower, upper))
        return jnp.where(cdf_1m >= q, res_1m, res).astype(intX())

    def _sample(self, key, shape, lower, upper):
        u = jax.random.uniform(key, shape, dtype=floatX())
        span = jnp.asarray(upper - lower + 1, floatX())
        return (lower + jnp.floor(u * span)).astype(intX())

    def _support_point(self, lower, upper):
        return ((lower + upper) // 2).astype(intX())


class Categorical(Discrete):
    """Reference discrete.py:1099. p along the LAST axis."""

    param_names = ("p",)
    param_event_ndims = (1,)

    def __dist_init__(self, p=None, logit_p=None):
        if p is not None and logit_p is not None:
            raise ValueError(
                "Incompatible parametrization. Can't specify both p and logit_p."
            )
        if p is None and logit_p is None:
            raise ValueError(
                "Incompatible parametrization. Must specify either p or logit_p."
            )
        if p is None:
            p = apply(lambda lp: jax.nn.softmax(lp, axis=-1), as_param(logit_p))
        elif not is_node(p):
            # constant p: reject negatives BEFORE rescaling can hide them
            # (reference discrete.py:1146-1164; the [-1,-1,0,0] edge case
            # sums to a negative and would rescale positive), then normalize
            # with a warning; symbolic p is checked at logp time instead
            # (sum-to-1 check_parameters precondition)
            p_ = np.asarray(p, dtype=float)
            if np.any(p_ < 0):
                raise ValueError(
                    f"Negative `p` parameters are not valid, got: {p_}"
                )
            p_sum = np.sum(p_, axis=-1)
            if not np.all(np.isclose(p_sum, 1.0)):
                import warnings

                warnings.warn(
                    f"`p` parameters sum to {p_sum}, instead of 1.0. "
                    "They will be automatically rescaled.",
                    UserWarning,
                )
                p = p_ / np.sum(p_, axis=-1, keepdims=True)
        self.p = as_param(p)

    @property
    def n_categories(self):
        from .distribution import _shape_of

        return _shape_of(self.p)[-1]

    @staticmethod
    def _take_value(table, value, k):
        # batch dims come from BOTH the value and the p table (a scalar value
        # against batched p broadcasts over the p batch — reference
        # test_categorical_logp_batch_dims "implicit batch p" case)
        batch = jnp.broadcast_shapes(jnp.shape(value), jnp.shape(table)[:-1])
        v = jnp.broadcast_to(jnp.clip(value, 0, k - 1), batch)
        return jnp.take_along_axis(
            jnp.broadcast_to(table, batch + (k,)),
            v[..., None].astype(jnp.int32),
            axis=-1,
        )[..., 0]

    def _logp(self, value, p):
        k = p.shape[-1]
        from .dist_math import safe_log

        # symbolic p is NOT silently normalized: sum(p) ~ 1 is a density
        # precondition (reference discrete.py:92-108 logp, check_parameters
        # isclose(sum(p), 1) — ParameterValueError there, -inf here)
        res = self._take_value(safe_log(p), value, k)
        res = jnp.where((value >= 0) & (value <= k - 1), res, -jnp.inf)
        return check_parameters(
            res,
            jnp.all(p >= 0, axis=-1),
            jnp.all(p <= 1, axis=-1),
            jnp.isclose(jnp.sum(p, axis=-1), 1.0),
        )

    def _logcdf(self, value, p):
        k = p.shape[-1]
        from .dist_math import safe_log

        res = self._take_value(safe_log(jnp.cumsum(p, axis=-1)), value, k)
        res = jnp.where(
            value < 0, -jnp.inf, jnp.where(value >= k - 1, 0.0, res)
        )
        return check_parameters(
            res,
            jnp.all(p >= 0, axis=-1),
            jnp.all(p <= 1, axis=-1),
            jnp.isclose(jnp.sum(p, axis=-1), 1.0),
        )

    def _sample(self, key, shape, p):
        from .dist_math import safe_log

        logits = safe_log(p)
        logits = jnp.broadcast_to(logits, shape + (p.shape[-1],))
        return jax.random.categorical(key, logits, axis=-1).astype(intX())

    def _support_point(self, p):
        return jnp.argmax(p, axis=-1).astype(intX())


class _OrderedBase(Discrete):
    # compute_p (named path only): register a `{name}_probs` Deterministic
    # with the category probabilities (reference discrete.py:1301-1306)
    _named_only_kwargs = ("compute_p",)
    param_names = ("eta", "cutpoints")
    param_event_ndims = (0, 1)

    def __dist_init__(self, eta, cutpoints):
        self.eta = as_param(eta)
        self.cutpoints = as_param(cutpoints)

    @staticmethod
    def _link_logcdf(x):  # pragma: no cover - abstract
        raise NotImplementedError

    @classmethod
    def _category_logits(cls, eta, cutpoints, sigma=None):
        # P(y = k) = F((c_k - eta)/sigma) - F((c_{k-1} - eta)/sigma), F per link
        eta = jnp.asarray(eta, floatX())
        z = cutpoints - eta[..., None]
        if sigma is not None:
            z = z / jnp.asarray(sigma, floatX())[..., None]
        lcdf = cls._link_logcdf(z)  # (..., K-1)
        neg_inf = jnp.full_like(lcdf[..., :1], -jnp.inf)
        lo = jnp.concatenate([neg_inf, lcdf], axis=-1)
        hi = jnp.concatenate([lcdf, jnp.zeros_like(lcdf[..., :1])], axis=-1)
        from ..math import _log1mexp_jax

        return hi + _log1mexp_jax(jnp.minimum(lo - hi, -1e-15))

    @classmethod
    def compute_p(cls, eta, cutpoints, sigma=None):
        """Category probabilities (reference OrderedLogistic.compute_p
        discrete.py:1313 / OrderedProbit.compute_p :1419); node-aware."""
        args = [as_param(eta), as_param(cutpoints)]
        if sigma is not None:
            args.append(as_param(sigma))
        return apply(lambda *xs: jnp.exp(cls._category_logits(*xs)), *args)

    @classmethod
    def _post_register(cls, model, name, dist, rv, compute_p=True):
        if not compute_p:
            return
        from ..model.core import Deterministic

        probs = cls.compute_p(*[getattr(dist, n) for n in dist.param_names])
        Deterministic(f"{name}_probs", probs, model=model)

    def _logp(self, value, eta, cutpoints, sigma=None):
        logits = self._category_logits(eta, cutpoints, sigma)
        k = logits.shape[-1]
        res = Categorical._take_value(logits, value, k)
        return jnp.where((value >= 0) & (value <= k - 1), res, -jnp.inf)

    def _logcdf(self, value, eta, cutpoints, sigma=None):
        logits = self._category_logits(eta, cutpoints, sigma)
        k = logits.shape[-1]
        table = jnp.log(jnp.cumsum(jnp.exp(logits), axis=-1))
        res = Categorical._take_value(table, value, k)
        return jnp.where(
            value < 0, -jnp.inf, jnp.where(value >= k - 1, 0.0, res)
        )

    def _sample(self, key, shape, eta, cutpoints, sigma=None):
        logits = self._category_logits(eta, cutpoints, sigma)
        logits = jnp.broadcast_to(logits, shape + logits.shape[-1:])
        return jax.random.categorical(key, logits, axis=-1).astype(intX())

    def _support_point(self, eta, cutpoints, sigma=None):
        logits = self._category_logits(eta, cutpoints, sigma)
        return jnp.argmax(logits, axis=-1).astype(intX())


class OrderedLogistic(_OrderedBase):
    """Reference discrete.py:1231."""

    @staticmethod
    def _link_logcdf(z):
        return -jax.nn.softplus(-z)


class OrderedProbit(_OrderedBase):
    """Reference discrete.py:1329 (takes a probit scale `sigma`)."""

    param_names = ("eta", "cutpoints", "sigma")
    param_event_ndims = (0, 1, 0)

    def __dist_init__(self, eta, cutpoints, sigma=1.0):
        super().__dist_init__(eta, cutpoints)
        self.sigma = as_param(sigma)

    @staticmethod
    def _link_logcdf(z):
        return normal_lcdf(0.0, 1.0, z)
