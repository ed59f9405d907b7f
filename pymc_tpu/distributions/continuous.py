"""Continuous univariate distributions.

Parity: reference pymc/distributions/continuous.py (class list at
SURVEY.md §2.3; e.g. Normal:445, Beta:1131, Gamma:2415, StudentT:1855, ...).
All densities are pure JAX, elementwise over the batch shape, guarded with
check_parameters (-inf on invalid params) and value-support masks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..config import floatX
from ..graph import apply, is_node
from .dist_math import (
    betaln,
    check_parameters,
    icdf_bisection,
    log_i0,
    log_normal,
    logpow,
    normal_lcdf,
    normal_lccdf,
)
from .distribution import Continuous, as_param

__all__ = [
    "Uniform", "Flat", "HalfFlat", "Normal", "TruncatedNormal", "HalfNormal",
    "Wald", "Beta", "Kumaraswamy", "Exponential", "Laplace",
    "AsymmetricLaplace", "LogNormal", "Lognormal", "StudentT", "HalfStudentT",
    "Pareto", "Cauchy", "HalfCauchy", "Gamma", "InverseGamma", "ChiSquared",
    "Weibull", "ExGaussian", "VonMises", "SkewNormal", "Triangular", "Gumbel",
    "Logistic", "LogitNormal", "Rice", "Moyal", "Interpolated",
    "SkewStudentT", "PolyaGamma",
]

_LOG_SQRT_2PI = 0.9189385332046727
_SQRT_2 = 1.4142135623730951
_SQRT_2_OVER_PI = 0.7978845608028654


def _sigma_tau(sigma, tau):
    """Resolve the (sigma, tau) alternative parametrization (reference
    continuous.py get_tau_sigma)."""
    if sigma is not None and tau is not None:
        raise ValueError("Can't pass both tau and sigma")
    if sigma is None and tau is None:
        return as_param(1.0)
    if tau is not None:
        return apply(lambda t: 1.0 / jnp.sqrt(t), as_param(tau))
    return as_param(sigma)


def _lam_sigma(sigma, lam):
    if sigma is not None and lam is not None:
        raise ValueError("Can't pass both lam and sigma")
    if sigma is None and lam is None:
        return as_param(1.0)
    if lam is not None:
        return apply(lambda l: 1.0 / jnp.sqrt(l), as_param(lam))
    return as_param(sigma)


# --------------------------------------------------------------------------
class Uniform(Continuous):
    """Reference continuous.py:249."""

    param_names = ("lower", "upper")
    support = "interval"

    def __dist_init__(self, lower=0.0, upper=1.0):
        self.lower = as_param(lower)
        self.upper = as_param(upper)

    def _interval_bounds(self):
        return self.lower, self.upper

    def _logp(self, value, lower, upper):
        res = -jnp.log(upper - lower)
        res = jnp.where((value >= lower) & (value <= upper), res, -jnp.inf)
        return check_parameters(res, lower < upper)

    def _logcdf(self, value, lower, upper):
        frac = jnp.clip((value - lower) / (upper - lower), 0.0, 1.0)
        from .dist_math import safe_log

        res = safe_log(frac)
        return check_parameters(res, lower < upper)

    def _icdf(self, q, lower, upper):
        return lower + q * (upper - lower)

    def _sample(self, key, shape, lower, upper):
        u = jax.random.uniform(key, shape, dtype=floatX())
        return lower + (upper - lower) * u

    def _support_point(self, lower, upper):
        return (lower + upper) / 2.0


class Flat(Continuous):
    """Improper flat prior on R (reference continuous.py:364). Not sampleable."""

    param_names = ()
    support = "real"

    def __dist_init__(self):
        pass

    def _logp(self, value):
        return jnp.zeros_like(value)

    def _logcdf(self, value):
        # reference continuous.py:380-383: log(1/2) at any finite value
        return jnp.where(
            value == -jnp.inf, -jnp.inf,
            jnp.where(value == jnp.inf, 0.0, jnp.log(0.5)),
        )

    def _sample(self, key, shape):
        raise NotImplementedError("Cannot sample from Flat distribution")

    def _support_point(self):
        return jnp.zeros(())


class HalfFlat(Continuous):
    """Improper flat prior on R+ (reference continuous.py:400)."""

    param_names = ()
    support = "positive"

    def __dist_init__(self):
        pass

    def _logp(self, value):
        return jnp.where(value > 0, 0.0, -jnp.inf)

    def _sample(self, key, shape):
        raise NotImplementedError("Cannot sample from HalfFlat distribution")

    def _support_point(self):
        return jnp.ones(())


class Normal(Continuous):
    """Reference continuous.py:445."""

    param_names = ("mu", "sigma")
    support = "real"

    def __dist_init__(self, mu=0.0, sigma=None, tau=None):
        self.mu = as_param(mu)
        self.sigma = _sigma_tau(sigma, tau)

    def _logp(self, value, mu, sigma):
        res = log_normal(value, mu, sigma)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, mu, sigma):
        return check_parameters(normal_lcdf(mu, sigma, value), sigma > 0)

    def _logccdf(self, value, mu, sigma):
        return check_parameters(normal_lccdf(mu, sigma, value), sigma > 0)

    def _icdf(self, q, mu, sigma):
        return mu + sigma * jsp.ndtri(q)

    def _sample(self, key, shape, mu, sigma):
        return mu + sigma * jax.random.normal(key, shape, dtype=floatX())

    def _support_point(self, mu, sigma):
        return jnp.broadcast_to(mu, jnp.broadcast_shapes(jnp.shape(mu), jnp.shape(sigma)))


class TruncatedNormal(Continuous):
    """Reference continuous.py:596."""

    param_names = ("mu", "sigma", "lower", "upper")
    support = "interval"

    def __dist_init__(self, mu=0.0, sigma=None, lower=None, upper=None, tau=None):
        self.mu = as_param(mu)
        self.sigma = _sigma_tau(sigma, tau)
        self.lower = as_param(lower) if lower is not None else None
        self.upper = as_param(upper) if upper is not None else None
        if lower is None and upper is None:
            raise ValueError("TruncatedNormal requires at least one bound")

    def _interval_bounds(self):
        return self.lower, self.upper

    def _log_z(self, mu, sigma, lower, upper):
        if lower is not None and upper is not None:
            a = normal_lcdf(mu, sigma, upper)
            b = normal_lcdf(mu, sigma, lower)
            return a + jnp.log1p(-jnp.exp(jnp.minimum(b - a, -1e-15)))
        if lower is not None:
            return normal_lccdf(mu, sigma, lower)
        return normal_lcdf(mu, sigma, upper)

    def _logp(self, value, mu, sigma, lower, upper):
        res = log_normal(value, mu, sigma) - self._log_z(mu, sigma, lower, upper)
        in_sup = True
        if lower is not None:
            in_sup = (value >= lower)
        if upper is not None:
            in_sup = in_sup & (value <= upper)
        res = jnp.where(in_sup, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, mu, sigma, lower, upper):
        logz = self._log_z(mu, sigma, lower, upper)
        hi = normal_lcdf(mu, sigma, value)
        if lower is not None:
            lo = normal_lcdf(mu, sigma, lower)
            num = hi + jnp.log1p(-jnp.exp(jnp.minimum(lo - hi, -1e-15)))
        else:
            num = hi
        res = jnp.minimum(num - logz, 0.0)
        if lower is not None:
            res = jnp.where(value < lower, -jnp.inf, res)
        if upper is not None:
            res = jnp.where(value >= upper, 0.0, res)
        return check_parameters(res, sigma > 0)

    def _sample(self, key, shape, mu, sigma, lower, upper):
        # inverse-CDF in the Phi domain: exact, vectorized, no rejection loop
        lo_u = jsp.ndtr((lower - mu) / sigma) if lower is not None else 0.0
        hi_u = jsp.ndtr((upper - mu) / sigma) if upper is not None else 1.0
        u = jax.random.uniform(key, shape, dtype=floatX())
        u = lo_u + (hi_u - lo_u) * u
        eps = jnp.finfo(floatX()).tiny
        return mu + sigma * jsp.ndtri(jnp.clip(u, eps, 1 - jnp.finfo(floatX()).epsneg))

    def _support_point(self, mu, sigma, lower, upper):
        pt = mu
        if lower is not None and upper is not None:
            pt = jnp.where((mu >= lower) & (mu <= upper), mu, (lower + upper) / 2)
        elif lower is not None:
            pt = jnp.maximum(mu, lower + sigma)
        elif upper is not None:
            pt = jnp.minimum(mu, upper - sigma)
        return pt + 0.0 * sigma


class HalfNormal(Continuous):
    """Reference continuous.py:822."""

    param_names = ("sigma",)
    support = "positive"

    def __dist_init__(self, sigma=None, tau=None):
        self.sigma = _sigma_tau(sigma, tau)

    def _logp(self, value, sigma):
        res = (
            0.5 * jnp.log(2.0 / jnp.pi)
            - jnp.log(sigma)
            - 0.5 * (value / sigma) ** 2
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, sigma):
        z = value / (sigma * _SQRT_2)
        res = jnp.log(jsp.erf(jnp.maximum(z, 0.0)))
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _icdf(self, q, sigma):
        return sigma * _SQRT_2 * jsp.erfinv(q)

    def _sample(self, key, shape, sigma):
        return sigma * jnp.abs(jax.random.normal(key, shape, dtype=floatX()))

    def _support_point(self, sigma):
        return sigma * _SQRT_2_OVER_PI


class Wald(Continuous):
    """Inverse Gaussian (reference continuous.py:952)."""

    param_names = ("mu", "lam", "alpha")
    support = "positive"

    def __dist_init__(self, mu=None, lam=None, phi=None, alpha=0.0):
        mu, lam = self._get_mu_lam(mu, lam, phi)
        self.mu = as_param(mu)
        self.lam = as_param(lam)
        self.alpha = as_param(alpha)

    @staticmethod
    def _get_mu_lam(mu, lam, phi):
        # reference continuous.py Wald.get_mu_lam_phi
        if mu is None:
            if lam is not None and phi is not None:
                return apply(jnp.divide, as_param(lam), as_param(phi)), lam
        else:
            if lam is None:
                if phi is None:
                    return mu, 1.0
                return mu, apply(jnp.multiply, as_param(mu), as_param(phi))
            if phi is None:
                return mu, lam
        raise ValueError("Wald requires two of (mu, lam, phi)")

    def _logp(self, value, mu, lam, alpha):
        v = value - alpha
        safe_v = jnp.where(v > 0, v, 1.0)
        res = (
            0.5 * jnp.log(lam / (2.0 * jnp.pi))
            - 1.5 * jnp.log(safe_v)
            - lam * (safe_v - mu) ** 2 / (2.0 * mu**2 * safe_v)
        )
        res = jnp.where(v > 0, res, -jnp.inf)
        # reference continuous.py Wald.logp: alpha >= 0 is a parameter
        # constraint, not merely a support shift
        return check_parameters(res, mu > 0, lam > 0, alpha >= 0)

    def _logcdf(self, value, mu, lam, alpha):
        v = value - alpha
        safe_v = jnp.where(v > 0, v, 1.0)
        l = jnp.sqrt(lam / safe_v)
        a = normal_lcdf(0, 1, l * (safe_v / mu - 1.0))
        b = 2.0 * lam / mu + normal_lcdf(0, 1, -l * (safe_v / mu + 1.0))
        res = a + jnp.log1p(jnp.exp(b - a))
        res = jnp.where(v > 0, res, -jnp.inf)
        # +inf: a/l are inf-ratio NaN there; CDF is exactly 1 (reference
        # continuous.py Wald.logcdf's lt(value, inf) switch)
        res = jnp.where(v == jnp.inf, 0.0, res)
        return check_parameters(jnp.minimum(res, 0.0), mu > 0, lam > 0,
                                alpha >= 0)

    def _sample(self, key, shape, mu, lam, alpha):
        # Michael-Schucany-Haas transform method
        k1, k2 = jax.random.split(key)
        nu = jax.random.normal(k1, shape, dtype=floatX())
        y = nu**2
        x = (
            mu
            + mu**2 * y / (2.0 * lam)
            - mu / (2.0 * lam) * jnp.sqrt(4.0 * mu * lam * y + mu**2 * y**2)
        )
        u = jax.random.uniform(k2, shape, dtype=floatX())
        take_x = u <= mu / (mu + x)
        return alpha + jnp.where(take_x, x, mu**2 / x)

    def _support_point(self, mu, lam, alpha):
        return mu + alpha + 0.0 * lam


class Beta(Continuous):
    """Reference continuous.py:1131."""

    param_names = ("alpha", "beta")
    support = "unit_interval"

    def __dist_init__(self, alpha=None, beta=None, mu=None, sigma=None, nu=None):
        alpha, beta = self._get_alpha_beta(alpha, beta, mu, sigma, nu)
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    @staticmethod
    def _get_alpha_beta(alpha, beta, mu, sigma, nu):
        if alpha is not None and beta is not None:
            return alpha, beta
        if mu is not None and sigma is not None:
            def _a(m, s):
                kappa = m * (1 - m) / s**2 - 1
                return m * kappa

            def _b(m, s):
                kappa = m * (1 - m) / s**2 - 1
                return (1 - m) * kappa

            return apply(_a, as_param(mu), as_param(sigma)), apply(
                _b, as_param(mu), as_param(sigma)
            )
        if mu is not None and nu is not None:
            return (
                apply(jnp.multiply, as_param(mu), as_param(nu)),
                apply(lambda m, n: (1 - m) * n, as_param(mu), as_param(nu)),
            )
        raise ValueError("Beta requires (alpha, beta), (mu, sigma) or (mu, nu)")

    def _logp(self, value, alpha, beta):
        safe = jnp.clip(value, 0.0, 1.0)
        res = (
            logpow(safe, alpha - 1.0)
            + logpow(1.0 - safe, beta - 1.0)
            - betaln(alpha, beta)
        )
        res = jnp.where((value >= 0) & (value <= 1), res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _logcdf(self, value, alpha, beta):
        safe = jnp.clip(value, 0.0, 1.0)
        from .dist_math import safe_log

        res = safe_log(jsp.betainc(alpha, beta, safe))
        res = jnp.where(value < 0, -jnp.inf, jnp.where(value >= 1, 0.0, res))
        return check_parameters(res, alpha > 0, beta > 0)

    def _icdf(self, q, alpha, beta):
        return icdf_bisection(
            lambda x: self._logcdf(x, alpha, beta),
            q,
            support="interval",
            lower=0.0,
            upper=1.0,
            logpdf_fn=lambda x: self._logp(x, alpha, beta),
        )

    def _sample(self, key, shape, alpha, beta):
        return jax.random.beta(key, alpha, beta, shape=shape, dtype=floatX())

    def _support_point(self, alpha, beta):
        return alpha / (alpha + beta)


class Kumaraswamy(Continuous):
    """Reference continuous.py:1317."""

    param_names = ("a", "b")
    support = "unit_interval"

    def __dist_init__(self, a, b):
        self.a = as_param(a)
        self.b = as_param(b)

    def _logp(self, value, a, b):
        safe = jnp.clip(value, 0.0, 1.0)
        res = (
            jnp.log(a)
            + jnp.log(b)
            + logpow(safe, a - 1.0)
            + logpow(1.0 - safe**a, b - 1.0)
        )
        res = jnp.where((value >= 0) & (value <= 1), res, -jnp.inf)
        return check_parameters(res, a > 0, b > 0)

    def _logcdf(self, value, a, b):
        safe = jnp.clip(value, 0.0, 1.0)
        from ..math import _log1mexp_jax

        res = _log1mexp_jax(b * jnp.log1p(-(safe**a)))
        res = jnp.where(value < 0, -jnp.inf, jnp.where(value >= 1, 0.0, res))
        return check_parameters(res, a > 0, b > 0)

    def _icdf(self, q, a, b):
        return (1.0 - (1.0 - q) ** (1.0 / b)) ** (1.0 / a)

    def _sample(self, key, shape, a, b):
        u = jax.random.uniform(key, shape, dtype=floatX())
        return self._icdf(u, a, b)

    def _support_point(self, a, b):
        # mean: b*B(1 + 1/a, b)
        return jnp.exp(
            jnp.log(b) + betaln(1.0 + 1.0 / a, b)
        )


class Exponential(Continuous):
    """Reference continuous.py:1417."""

    param_names = ("lam",)
    support = "positive"

    def __dist_init__(self, lam=None, scale=None):
        if lam is None and scale is None:
            raise ValueError("Exponential requires lam or scale")
        if scale is not None:
            lam = apply(lambda s: 1.0 / s, as_param(scale))
        self.lam = as_param(lam)

    def _logp(self, value, lam):
        res = jnp.log(lam) - lam * value
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, lam > 0)

    def _logcdf(self, value, lam):
        from ..math import _log1mexp_jax

        res = _log1mexp_jax(-lam * jnp.maximum(value, 0.0))
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, lam > 0)

    def _logccdf(self, value, lam):
        res = -lam * jnp.maximum(value, 0.0)
        return check_parameters(res, lam > 0)

    def _icdf(self, q, lam):
        return -jnp.log1p(-q) / lam

    def _sample(self, key, shape, lam):
        return jax.random.exponential(key, shape, dtype=floatX()) / lam

    def _support_point(self, lam):
        return 1.0 / lam


class Laplace(Continuous):
    """Reference continuous.py:1511."""

    param_names = ("mu", "b")
    support = "real"

    def __dist_init__(self, mu=0.0, b=1.0):
        self.mu = as_param(mu)
        self.b = as_param(b)

    def _logp(self, value, mu, b):
        res = -jnp.log(2.0 * b) - jnp.abs(value - mu) / b
        return check_parameters(res, b > 0)

    def _logcdf(self, value, mu, b):
        z = (value - mu) / b
        res = jnp.where(
            z <= 0,
            jnp.log(0.5) + z,
            jnp.log1p(-0.5 * jnp.exp(-z)),
        )
        return check_parameters(res, b > 0)

    def _icdf(self, q, mu, b):
        return jnp.where(
            q < 0.5,
            mu + b * jnp.log(2.0 * q),
            mu - b * jnp.log(2.0 - 2.0 * q),
        )

    def _sample(self, key, shape, mu, b):
        return mu + b * jax.random.laplace(key, shape, dtype=floatX())

    def _support_point(self, mu, b):
        return mu + 0.0 * b


class AsymmetricLaplace(Continuous):
    """Reference continuous.py:1633."""

    param_names = ("b", "kappa", "mu")
    support = "real"

    def __dist_init__(self, kappa=None, mu=0.0, b=1.0, q=None):
        if q is not None and kappa is not None:
            raise ValueError("Specify kappa or q, not both")
        if q is not None:
            kappa = apply(lambda qq: jnp.sqrt(qq / (1.0 - qq)), as_param(q))
        if kappa is None:
            kappa = 1.0
        self.b = as_param(b)
        self.kappa = as_param(kappa)
        self.mu = as_param(mu)

    def _logp(self, value, b, kappa, mu):
        z = value - mu
        res = (
            jnp.log(b / (kappa + 1.0 / kappa))
            - z * b * jnp.sign(z) * (kappa ** jnp.sign(z))
        )
        return check_parameters(res, b > 0, kappa > 0)

    def _sample(self, key, shape, b, kappa, mu):
        u = jax.random.uniform(key, shape, dtype=floatX())
        switch = kappa**2 / (1.0 + kappa**2)
        non_positive = mu + kappa / b * jnp.log(u * (1.0 / switch))
        positive = mu - 1.0 / (kappa * b) * jnp.log((1.0 - u) * (1.0 + kappa**2))
        return jnp.where(u > switch, positive, non_positive)

    def _support_point(self, b, kappa, mu):
        return mu - (kappa - 1.0 / kappa) / b


class LogNormal(Continuous):
    """Reference continuous.py:1723."""

    param_names = ("mu", "sigma")
    support = "positive"

    def __dist_init__(self, mu=0.0, sigma=None, tau=None):
        self.mu = as_param(mu)
        self.sigma = _sigma_tau(sigma, tau)

    def _logp(self, value, mu, sigma):
        safe = jnp.where(value > 0, value, 1.0)
        res = log_normal(jnp.log(safe), mu, sigma) - jnp.log(safe)
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, mu, sigma):
        safe = jnp.where(value > 0, value, 1.0)
        res = normal_lcdf(mu, sigma, jnp.log(safe))
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _icdf(self, q, mu, sigma):
        return jnp.exp(mu + sigma * jsp.ndtri(q))

    def _sample(self, key, shape, mu, sigma):
        return jnp.exp(mu + sigma * jax.random.normal(key, shape, dtype=floatX()))

    def _support_point(self, mu, sigma):
        return jnp.exp(mu + sigma**2 / 2.0)


Lognormal = LogNormal


def _log_t_tail_survival(nu, abs_t):
    """log I_x(nu/2, 1/2) with x = nu/(nu + t^2) — the Student-T two-tail
    survival P(|T| > t) as a regularized incomplete beta. Deep tails
    (x < 1e-10) switch to the leading asymptotic I_x(a, b) -> x^a/(a B(a, b)):
    XLA's betainc returns 0 once x goes denormal (x ~ 2e-308 at nu=0.01,
    t ~ 1e153), which silently floors extreme-tail quantiles."""
    from .dist_math import safe_log

    a = nu / 2.0
    tiny = jnp.finfo(jnp.result_type(abs_t, jnp.float32)).tiny
    log_t = jnp.log(jnp.maximum(abs_t, tiny))
    log_x = jnp.log(nu) - jnp.logaddexp(jnp.log(nu), 2.0 * log_t)
    x = nu / (nu + abs_t**2)
    ib = jsp.betainc(a, 0.5, jnp.clip(x, 0.0, 1.0))
    log_beta_ab = jsp.gammaln(a) + jsp.gammaln(0.5) - jsp.gammaln(a + 0.5)
    log_asym = a * log_x - jnp.log(a) - log_beta_ab
    return jnp.where(log_x < -23.0, log_asym, safe_log(ib))


class StudentT(Continuous):
    """Reference continuous.py:1855."""

    param_names = ("nu", "mu", "sigma")
    support = "real"

    def __dist_init__(self, nu, mu=0.0, sigma=None, lam=None):
        self.nu = as_param(nu)
        self.mu = as_param(mu)
        self.sigma = _lam_sigma(sigma, lam)

    def _logp(self, value, nu, mu, sigma):
        z = (value - mu) / sigma
        res = (
            jsp.gammaln((nu + 1.0) / 2.0)
            - jsp.gammaln(nu / 2.0)
            - 0.5 * jnp.log(nu * jnp.pi)
            - jnp.log(sigma)
            - (nu + 1.0) / 2.0 * jnp.log1p(z**2 / nu)
        )
        return check_parameters(res, nu > 0, sigma > 0)

    def _logcdf(self, value, nu, mu, sigma):
        t = (value - mu) / sigma
        log_ib = _log_t_tail_survival(nu, jnp.abs(t))
        res = jnp.where(
            t >= 0,
            jnp.log1p(-0.5 * jnp.exp(log_ib)),
            jnp.log(0.5) + log_ib,
        )
        return check_parameters(res, nu > 0, sigma > 0)

    def _icdf(self, q, nu, mu, sigma):
        return icdf_bisection(
            lambda x: self._logcdf(x, nu, mu, sigma),
            q,
            support="real",
            logpdf_fn=lambda x: self._logp(x, nu, mu, sigma),
        )

    def _sample(self, key, shape, nu, mu, sigma):
        return mu + sigma * jax.random.t(key, nu, shape, dtype=floatX())

    def _support_point(self, nu, mu, sigma):
        return jnp.broadcast_to(
            mu, jnp.broadcast_shapes(jnp.shape(nu), jnp.shape(mu), jnp.shape(sigma))
        )


class HalfStudentT(Continuous):
    """Reference continuous.py:2862."""

    param_names = ("nu", "sigma")
    support = "positive"

    def __dist_init__(self, nu=1.0, sigma=None, lam=None):
        self.nu = as_param(nu)
        self.sigma = _lam_sigma(sigma, lam)

    def _logp(self, value, nu, sigma):
        z = value / sigma
        res = (
            jnp.log(2.0)
            + jsp.gammaln((nu + 1.0) / 2.0)
            - jsp.gammaln(nu / 2.0)
            - 0.5 * jnp.log(nu * jnp.pi)
            - jnp.log(sigma)
            - (nu + 1.0) / 2.0 * jnp.log1p(z**2 / nu)
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, nu > 0, sigma > 0)

    def _logcdf(self, value, nu, sigma):
        # P(|T| <= z) = 1 - I_{nu/(nu+z^2)}(nu/2, 1/2) — the two-tail
        # survival of Student-T is the regularized incomplete beta
        z = jnp.maximum(value, 0.0) / sigma
        res = jnp.log1p(-jnp.exp(_log_t_tail_survival(nu, z)))
        res = jnp.where(value >= 0, res, -jnp.inf)
        res = jnp.where(value == jnp.inf, 0.0, res)
        return check_parameters(res, nu > 0, sigma > 0)

    def _icdf(self, q, nu, sigma):
        return icdf_bisection(
            lambda x: self._logcdf(x, nu, sigma),
            q,
            support="positive",
            logpdf_fn=lambda x: self._logp(x, nu, sigma),
        )

    def _sample(self, key, shape, nu, sigma):
        return jnp.abs(sigma * jax.random.t(key, nu, shape, dtype=floatX()))

    def _support_point(self, nu, sigma):
        return sigma + 0.0 * nu


class Pareto(Continuous):
    """Reference continuous.py:2116."""

    param_names = ("alpha", "m")
    support = "interval"  # [m, inf)

    def __dist_init__(self, alpha, m):
        self.alpha = as_param(alpha)
        self.m = as_param(m)

    def _interval_bounds(self):
        return self.m, None

    def _logp(self, value, alpha, m):
        safe = jnp.where(value > 0, value, 1.0)
        res = jnp.log(alpha) + alpha * jnp.log(m) - (alpha + 1.0) * jnp.log(safe)
        res = jnp.where(value >= m, res, -jnp.inf)
        return check_parameters(res, alpha > 0, m > 0)

    def _logcdf(self, value, alpha, m):
        safe = jnp.where(value > 0, value, 1.0)
        from ..math import _log1mexp_jax

        res = _log1mexp_jax(alpha * (jnp.log(m) - jnp.log(safe)))
        res = jnp.where(value >= m, res, -jnp.inf)
        return check_parameters(res, alpha > 0, m > 0)

    def _icdf(self, q, alpha, m):
        return m * (1.0 - q) ** (-1.0 / alpha)

    def _sample(self, key, shape, alpha, m):
        return m * jnp.exp(jax.random.exponential(key, shape, dtype=floatX()) / alpha)

    def _support_point(self, alpha, m):
        az = jnp.where(alpha > 1, alpha, 2.0)
        mean = az * m / (az - 1.0)
        return mean


class Cauchy(Continuous):
    """Reference continuous.py:2225."""

    param_names = ("alpha", "beta")
    support = "real"

    def __dist_init__(self, alpha=0.0, beta=1.0):
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    def _logp(self, value, alpha, beta):
        z = (value - alpha) / beta
        res = -jnp.log(jnp.pi) - jnp.log(beta) - jnp.log1p(z**2)
        return check_parameters(res, beta > 0)

    def _logcdf(self, value, alpha, beta):
        z = (value - alpha) / beta
        res = jnp.log(0.5 + jnp.arctan(z) / jnp.pi)
        return check_parameters(res, beta > 0)

    def _icdf(self, q, alpha, beta):
        return alpha + beta * jnp.tan(jnp.pi * (q - 0.5))

    def _sample(self, key, shape, alpha, beta):
        return alpha + beta * jax.random.cauchy(key, shape, dtype=floatX())

    def _support_point(self, alpha, beta):
        return alpha + 0.0 * beta


class HalfCauchy(Continuous):
    """Reference continuous.py:2330."""

    param_names = ("beta",)
    support = "positive"

    def __dist_init__(self, beta):
        self.beta = as_param(beta)

    def _logp(self, value, beta):
        z = value / beta
        res = jnp.log(2.0 / jnp.pi) - jnp.log(beta) - jnp.log1p(z**2)
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, beta > 0)

    def _logcdf(self, value, beta):
        z = jnp.maximum(value, 0.0) / beta
        res = jnp.log(2.0 * jnp.arctan(z) / jnp.pi)
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, beta > 0)

    def _icdf(self, q, beta):
        return beta * jnp.tan(jnp.pi * q / 2.0)

    def _sample(self, key, shape, beta):
        return jnp.abs(beta * jax.random.cauchy(key, shape, dtype=floatX()))

    def _support_point(self, beta):
        return beta


class Gamma(Continuous):
    """Reference continuous.py:2415."""

    param_names = ("alpha", "beta")
    support = "positive"

    def __dist_init__(self, alpha=None, beta=None, mu=None, sigma=None):
        alpha, beta = self._get_alpha_beta(alpha, beta, mu, sigma)
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    @staticmethod
    def _get_alpha_beta(alpha, beta, mu, sigma):
        if alpha is not None and beta is not None:
            return alpha, beta
        if mu is not None and sigma is not None:
            mu, sigma = as_param(mu), as_param(sigma)
            return (
                apply(lambda m, s: m**2 / s**2, mu, sigma),
                apply(lambda m, s: m / s**2, mu, sigma),
            )
        raise ValueError("Gamma requires (alpha, beta) or (mu, sigma)")

    def _logp(self, value, alpha, beta):
        safe = jnp.where(value > 0, value, 1.0)
        res = (
            alpha * jnp.log(beta)
            + logpow(safe, alpha - 1.0)
            - beta * safe
            - jsp.gammaln(alpha)
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _logcdf(self, value, alpha, beta):
        safe = jnp.maximum(value, 0.0)
        from .dist_math import safe_log

        res = safe_log(jsp.gammainc(alpha, beta * safe))
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _icdf(self, q, alpha, beta):
        return icdf_bisection(
            lambda x: self._logcdf(x, alpha, beta),
            q,
            support="positive",
            logpdf_fn=lambda x: self._logp(x, alpha, beta),
        )

    def _sample(self, key, shape, alpha, beta):
        return jax.random.gamma(key, alpha, shape=shape, dtype=floatX()) / beta

    def _support_point(self, alpha, beta):
        return alpha / beta


class InverseGamma(Continuous):
    """Reference continuous.py:2543."""

    param_names = ("alpha", "beta")
    support = "positive"

    def __dist_init__(self, alpha=None, beta=None, mu=None, sigma=None):
        alpha, beta = self._get_alpha_beta(alpha, beta, mu, sigma)
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    @staticmethod
    def _get_alpha_beta(alpha, beta, mu, sigma):
        if alpha is not None:
            return alpha, beta if beta is not None else 1.0
        if mu is not None and sigma is not None:
            mu, sigma = as_param(mu), as_param(sigma)
            return (
                apply(lambda m, s: (m / s) ** 2 + 2.0, mu, sigma),
                apply(lambda m, s: m * ((m / s) ** 2 + 1.0), mu, sigma),
            )
        raise ValueError("InverseGamma requires alpha(+beta) or (mu, sigma)")

    def _logp(self, value, alpha, beta):
        safe = jnp.where(value > 0, value, 1.0)
        res = (
            alpha * jnp.log(beta)
            - (alpha + 1.0) * jnp.log(safe)
            - beta / safe
            - jsp.gammaln(alpha)
        )
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _logcdf(self, value, alpha, beta):
        safe = jnp.where(value > 0, value, 1.0)
        from .dist_math import safe_log

        res = safe_log(jsp.gammaincc(alpha, beta / safe))
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _icdf(self, q, alpha, beta):
        return icdf_bisection(
            lambda x: self._logcdf(x, alpha, beta),
            q,
            support="positive",
            logpdf_fn=lambda x: self._logp(x, alpha, beta),
        )

    def _sample(self, key, shape, alpha, beta):
        return beta / jax.random.gamma(key, alpha, shape=shape, dtype=floatX())

    def _support_point(self, alpha, beta):
        # mean when alpha > 1, else beta/alpha
        return jnp.where(alpha > 1, beta / (alpha - 1.0), beta / alpha)


class ChiSquared(Continuous):
    """Reference continuous.py:2659."""

    param_names = ("nu",)
    support = "positive"

    def __dist_init__(self, nu):
        self.nu = as_param(nu)

    def _logp(self, value, nu):
        return Gamma._logp(self, value, nu / 2.0, 0.5)

    def _logcdf(self, value, nu):
        return Gamma._logcdf(self, value, nu / 2.0, 0.5)

    def _icdf(self, q, nu):
        return Gamma._icdf(self, q, nu / 2.0, 0.5)

    def _sample(self, key, shape, nu):
        return 2.0 * jax.random.gamma(key, nu / 2.0, shape=shape, dtype=floatX())

    def _support_point(self, nu):
        return nu


class Weibull(Continuous):
    """Reference continuous.py:2740 (alpha shape, beta scale)."""

    param_names = ("alpha", "beta")
    support = "positive"

    def __dist_init__(self, alpha, beta):
        self.alpha = as_param(alpha)
        self.beta = as_param(beta)

    def _logp(self, value, alpha, beta):
        safe = jnp.where(value > 0, value, 1.0)
        z = safe / beta
        res = (
            jnp.log(alpha)
            - jnp.log(beta)
            + (alpha - 1.0) * jnp.log(z)
            - z**alpha
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _logcdf(self, value, alpha, beta):
        z = jnp.maximum(value, 0.0) / beta
        from ..math import _log1mexp_jax

        res = _log1mexp_jax(-(z**alpha))
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, alpha > 0, beta > 0)

    def _logccdf(self, value, alpha, beta):
        z = jnp.maximum(value, 0.0) / beta
        return check_parameters(-(z**alpha), alpha > 0, beta > 0)

    def _icdf(self, q, alpha, beta):
        return beta * (-jnp.log1p(-q)) ** (1.0 / alpha)

    def _sample(self, key, shape, alpha, beta):
        e = jax.random.exponential(key, shape, dtype=floatX())
        return beta * e ** (1.0 / alpha)

    def _support_point(self, alpha, beta):
        return beta * jnp.exp(jsp.gammaln(1.0 + 1.0 / alpha))


class ExGaussian(Continuous):
    """Exponentially modified Gaussian (reference continuous.py:2994)."""

    param_names = ("mu", "sigma", "nu")
    support = "real"

    def __dist_init__(self, mu=0.0, sigma=None, nu=None):
        self.mu = as_param(mu)
        self.sigma = as_param(sigma if sigma is not None else 1.0)
        self.nu = as_param(nu if nu is not None else 1.0)

    def _logp(self, value, mu, sigma, nu):
        # reference uses the standard formula with a normal approximation
        # when nu is negligible vs sigma (continuous.py ExGaussian.logp)
        std = (
            -jnp.log(nu)
            + (mu - value) / nu
            + 0.5 * (sigma / nu) ** 2
            + normal_lcdf(mu + (sigma**2) / nu, sigma, value)
        )
        approx = log_normal(value, mu, sigma)
        res = jnp.where(nu > 0.05 * sigma, std, approx)
        return check_parameters(res, sigma > 0, nu > 0)

    def _logcdf(self, value, mu, sigma, nu):
        # logcdf = log( Phi(z) - exp(exgaussian upper term) ), computed in
        # log space for stability (reference ExGaussian.logcdf)
        lp1 = normal_lcdf(mu, sigma, value)
        lp2 = (
            (mu - value) / nu
            + 0.5 * (sigma / nu) ** 2
            + normal_lcdf(mu + (sigma**2) / nu, sigma, value)
        )
        from ..math import _log1mexp_jax

        res = lp1 + _log1mexp_jax(jnp.minimum(lp2 - lp1, -1e-15))
        approx = normal_lcdf(mu, sigma, value)
        res = jnp.where(nu > 0.05 * sigma, res, approx)
        # -inf: lp2 is (+inf) + (-inf) = NaN there; CDF is exactly 0
        res = jnp.where(value == -jnp.inf, -jnp.inf, res)
        return check_parameters(res, sigma > 0, nu > 0)

    def _sample(self, key, shape, mu, sigma, nu):
        k1, k2 = jax.random.split(key)
        n = mu + sigma * jax.random.normal(k1, shape, dtype=floatX())
        e = nu * jax.random.exponential(k2, shape, dtype=floatX())
        return n + e

    def _support_point(self, mu, sigma, nu):
        return mu + nu + 0.0 * sigma


class VonMises(Continuous):
    """Reference continuous.py:3117."""

    param_names = ("mu", "kappa")
    support = "circular"

    def __dist_init__(self, mu=0.0, kappa=None):
        self.mu = as_param(mu)
        self.kappa = as_param(kappa if kappa is not None else 1.0)

    def _logp(self, value, mu, kappa):
        res = kappa * jnp.cos(value - mu) - jnp.log(2.0 * jnp.pi) - log_i0(kappa)
        res = jnp.where((value >= -jnp.pi) & (value <= jnp.pi), res, -jnp.inf)
        return check_parameters(res, kappa >= 0)

    def _sample(self, key, shape, mu, kappa):
        # Best-Fisher (1979) rejection via fixed-budget masked retries: TPU
        # friendly (no data-dependent shapes); 32 rounds is astronomically safe
        # (acceptance rate ~0.65+ per round).
        dt = floatX()
        kappa_b = jnp.broadcast_to(jnp.asarray(kappa, dt), shape)
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa_b**2)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa_b)
        r = (1.0 + rho**2) / (2.0 * rho)

        def body(i, state):
            accepted, out, k = state
            k, k1, k2, k3 = jax.random.split(k, 4)
            u1 = jax.random.uniform(k1, shape, dtype=dt)
            u2 = jax.random.uniform(k2, shape, dtype=dt)
            u3 = jax.random.uniform(k3, shape, dtype=dt)
            z = jnp.cos(jnp.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c = kappa_b * (r - f)
            accept = jnp.logical_or(
                c * (2.0 - c) - u2 > 0, jnp.log(c / u2) + 1.0 - c >= 0
            )
            theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            out = jnp.where(jnp.logical_and(accept, ~accepted), theta, out)
            return jnp.logical_or(accepted, accept), out, k

        accepted = jnp.zeros(shape, dtype=bool)
        out = jnp.zeros(shape, dtype=dt)
        _, theta, _ = jax.lax.fori_loop(0, 32, body, (accepted, out, key))
        ang = theta + mu
        # wrap to (-pi, pi]
        return jnp.arctan2(jnp.sin(ang), jnp.cos(ang))

    def _support_point(self, mu, kappa):
        return jnp.arctan2(jnp.sin(mu), jnp.cos(mu)) + 0.0 * kappa


class SkewNormal(Continuous):
    """Reference continuous.py:3203."""

    param_names = ("mu", "sigma", "alpha")
    support = "real"

    def __dist_init__(self, mu=0.0, sigma=None, alpha=1.0, tau=None):
        self.mu = as_param(mu)
        self.sigma = _sigma_tau(sigma, tau)
        self.alpha = as_param(alpha)

    def _logp(self, value, mu, sigma, alpha):
        z = (value - mu) / sigma
        res = (
            jnp.log(2.0)
            + log_normal(value, mu, sigma)
            + normal_lcdf(0.0, 1.0, alpha * z)
        )
        return check_parameters(res, sigma > 0)

    def _sample(self, key, shape, mu, sigma, alpha):
        k1, k2 = jax.random.split(key)
        delta = alpha / jnp.sqrt(1.0 + alpha**2)
        u0 = jax.random.normal(k1, shape, dtype=floatX())
        v = jax.random.normal(k2, shape, dtype=floatX())
        z = delta * jnp.abs(u0) + jnp.sqrt(1.0 - delta**2) * v
        return mu + sigma * z

    def _support_point(self, mu, sigma, alpha):
        delta = alpha / jnp.sqrt(1.0 + alpha**2)
        return mu + sigma * delta * _SQRT_2_OVER_PI


class Triangular(Continuous):
    """Reference continuous.py:3298."""

    param_names = ("lower", "c", "upper")
    support = "interval"

    def __dist_init__(self, lower=0.0, upper=1.0, c=0.5):
        self.lower = as_param(lower)
        self.c = as_param(c)
        self.upper = as_param(upper)

    def _interval_bounds(self):
        return self.lower, self.upper

    def _logp(self, value, lower, c, upper):
        from .dist_math import safe_log

        left = safe_log(
            2.0 * (value - lower) / ((upper - lower) * (c - lower))
        )
        right = safe_log(
            2.0 * (upper - value) / ((upper - lower) * (upper - c))
        )
        peak = jnp.log(2.0) - jnp.log(upper - lower)
        res = jnp.where(value < c, left, jnp.where(value > c, right, peak))
        res = jnp.where((value >= lower) & (value <= upper), res, -jnp.inf)
        return check_parameters(res, lower <= c, c <= upper, lower < upper)

    def _logcdf(self, value, lower, c, upper):
        from .dist_math import safe_log

        left = safe_log((value - lower) ** 2 / ((upper - lower) * (c - lower)))
        right = jnp.log1p(
            -((upper - value) ** 2) / ((upper - lower) * (upper - c))
        )
        res = jnp.where(value <= c, left, right)
        res = jnp.where(value < lower, -jnp.inf, jnp.where(value >= upper, 0.0, res))
        return check_parameters(res, lower <= c, c <= upper, lower < upper)

    def _icdf(self, q, lower, c, upper):
        fc = (c - lower) / (upper - lower)
        left = lower + jnp.sqrt(q * (upper - lower) * (c - lower))
        right = upper - jnp.sqrt((1.0 - q) * (upper - lower) * (upper - c))
        return jnp.where(q < fc, left, right)

    def _sample(self, key, shape, lower, c, upper):
        u = jax.random.uniform(key, shape, dtype=floatX())
        return self._icdf(u, lower, c, upper)

    def _support_point(self, lower, c, upper):
        return (lower + c + upper) / 3.0


class Gumbel(Continuous):
    """Reference continuous.py:3427."""

    param_names = ("mu", "beta")
    support = "real"

    def __dist_init__(self, mu=0.0, beta=1.0):
        self.mu = as_param(mu)
        self.beta = as_param(beta)

    def _logp(self, value, mu, beta):
        z = (value - mu) / beta
        res = -z - jnp.exp(-z) - jnp.log(beta)
        return check_parameters(res, beta > 0)

    def _logcdf(self, value, mu, beta):
        res = -jnp.exp(-(value - mu) / beta)
        return check_parameters(res, beta > 0)

    def _icdf(self, q, mu, beta):
        return mu - beta * jnp.log(-jnp.log(q))

    def _sample(self, key, shape, mu, beta):
        return mu + beta * jax.random.gumbel(key, shape, dtype=floatX())

    def _support_point(self, mu, beta):
        return mu + beta * 0.5772156649015329  # Euler-Mascheroni


class Logistic(Continuous):
    """Reference continuous.py:3654."""

    param_names = ("mu", "s")
    support = "real"

    def __dist_init__(self, mu=0.0, s=1.0):
        self.mu = as_param(mu)
        self.s = as_param(s)

    def _logp(self, value, mu, s):
        z = (value - mu) / s
        res = -z - jnp.log(s) - 2.0 * jax.nn.softplus(-z)
        return check_parameters(res, s > 0)

    def _logcdf(self, value, mu, s):
        z = (value - mu) / s
        return check_parameters(-jax.nn.softplus(-z), s > 0)

    def _icdf(self, q, mu, s):
        return mu + s * (jnp.log(q) - jnp.log1p(-q))

    def _sample(self, key, shape, mu, s):
        return mu + s * jax.random.logistic(key, shape, dtype=floatX())

    def _support_point(self, mu, s):
        return mu + 0.0 * s


class LogitNormal(Continuous):
    """Reference continuous.py:3741."""

    param_names = ("mu", "sigma")
    support = "unit_interval"

    def __dist_init__(self, mu=0.0, sigma=None, tau=None):
        self.mu = as_param(mu)
        self.sigma = _sigma_tau(sigma, tau)

    def _logp(self, value, mu, sigma):
        inside = (value > 0) & (value < 1)
        safe = jnp.where(inside, value, 0.5)
        lv = jsp.logit(safe)
        res = (
            log_normal(lv, mu, sigma) - jnp.log(safe) - jnp.log1p(-safe)
        )
        res = jnp.where(inside, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, mu, sigma):
        inside = (value > 0) & (value < 1)
        safe = jnp.where(inside, value, 0.5)
        res = normal_lcdf(mu, sigma, jsp.logit(safe))
        res = jnp.where(value <= 0, -jnp.inf, jnp.where(value >= 1, 0.0, res))
        return check_parameters(res, sigma > 0)

    def _icdf(self, q, mu, sigma):
        return jax.nn.sigmoid(mu + sigma * jsp.ndtri(q))

    def _sample(self, key, shape, mu, sigma):
        return jax.nn.sigmoid(
            mu + sigma * jax.random.normal(key, shape, dtype=floatX())
        )

    def _support_point(self, mu, sigma):
        return jax.nn.sigmoid(mu) + 0.0 * sigma


class Rice(Continuous):
    """Reference continuous.py:3538 (nu, sigma; alt b = nu/sigma)."""

    param_names = ("nu", "sigma")
    support = "positive"

    def __dist_init__(self, nu=None, sigma=None, b=None):
        sigma = as_param(sigma if sigma is not None else 1.0)
        if nu is None and b is not None:
            nu = apply(jnp.multiply, as_param(b), sigma)
        self.nu = as_param(nu if nu is not None else 1.0)
        self.sigma = sigma

    def _logp(self, value, nu, sigma):
        safe = jnp.where(value > 0, value, 1.0)
        x = safe / sigma**2
        res = (
            jnp.log(x)
            - (safe**2 + nu**2) / (2.0 * sigma**2)
            + log_i0(safe * nu / sigma**2)
        )
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, nu >= 0, sigma > 0)

    def _sample(self, key, shape, nu, sigma):
        k1, k2 = jax.random.split(key)
        x = nu + sigma * jax.random.normal(k1, shape, dtype=floatX())
        y = sigma * jax.random.normal(k2, shape, dtype=floatX())
        return jnp.sqrt(x**2 + y**2)

    def _support_point(self, nu, sigma):
        # mean via Laguerre polynomial approx; use sqrt(nu^2 + 2 sigma^2) as a
        # cheap finite in-support point
        return jnp.sqrt(nu**2 + 2.0 * sigma**2)


class Moyal(Continuous):
    """Reference continuous.py:3982."""

    param_names = ("mu", "sigma")
    support = "real"

    def __dist_init__(self, mu=0.0, sigma=1.0):
        self.mu = as_param(mu)
        self.sigma = as_param(sigma)

    def _logp(self, value, mu, sigma):
        z = (value - mu) / sigma
        res = -0.5 * (z + jnp.exp(-z)) - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
        return check_parameters(res, sigma > 0)

    def _logcdf(self, value, mu, sigma):
        z = (value - mu) / sigma
        res = jnp.log(jsp.erfc(jnp.exp(-0.5 * z) / _SQRT_2))
        return check_parameters(res, sigma > 0)

    def _icdf(self, q, mu, sigma):
        # invert erfc(exp(-z/2)/sqrt(2)) = q
        z = -2.0 * jnp.log(_SQRT_2 * jsp.erfinv(1.0 - q))
        return mu + sigma * z

    def _sample(self, key, shape, mu, sigma):
        u = jax.random.uniform(
            key, shape, dtype=floatX(), minval=jnp.finfo(floatX()).tiny
        )
        return self._icdf(u, mu, sigma)

    def _support_point(self, mu, sigma):
        return mu + sigma * (0.5772156649015329 + jnp.log(2.0))


class Interpolated(Continuous):
    """Piecewise-linear pdf from tabulated points (reference continuous.py:3856).

    x_points/pdf_points are static numpy arrays; pdf is normalized internally.
    """

    param_names = ()
    support = "interval"

    def __dist_init__(self, x_points, pdf_points):
        x = np.asarray(x_points, dtype=np.float64)
        p = np.asarray(pdf_points, dtype=np.float64)
        if x.ndim != 1 or p.shape != x.shape:
            raise ValueError("x_points and pdf_points must be 1-D equal-length")
        # trapezoid normalization
        z = np.trapezoid(p, x) if hasattr(np, "trapezoid") else np.trapz(p, x)
        p = p / z
        self.x_points = jnp.asarray(x, dtype=floatX())
        self.pdf_points = jnp.asarray(p, dtype=floatX())
        cdf = np.concatenate(
            [[0.0], np.cumsum((p[1:] + p[:-1]) / 2.0 * np.diff(x))]
        )
        self.cdf_points = jnp.asarray(cdf / cdf[-1], dtype=floatX())
        self._lower = float(x[0])
        self._upper = float(x[-1])

    def _interval_bounds(self):
        return self._lower, self._upper

    def _logp(self, value):
        pdf = jnp.interp(value, self.x_points, self.pdf_points)
        from .dist_math import safe_log

        res = safe_log(pdf)
        return jnp.where(
            (value >= self._lower) & (value <= self._upper), res, -jnp.inf
        )

    def _logcdf(self, value):
        from .dist_math import safe_log

        c = jnp.interp(value, self.x_points, self.cdf_points)
        return safe_log(c)

    def _icdf(self, q, *params):
        return jnp.interp(q, self.cdf_points, self.x_points)

    def _sample(self, key, shape):
        u = jax.random.uniform(key, shape, dtype=floatX())
        return jnp.interp(u, self.cdf_points, self.x_points)

    def _support_point(self):
        # density-weighted mean
        mids = (self.x_points[1:] + self.x_points[:-1]) / 2.0
        w = (self.pdf_points[1:] + self.pdf_points[:-1]) / 2.0 * jnp.diff(
            self.x_points
        )
        return jnp.sum(mids * w) / jnp.sum(w)


class SkewStudentT(Continuous):
    """Jones-Faddy skew Student-t (reference continuous.py:2001; scipy
    jf_skew_t oracle). a, b control tail/skew; mu, sigma locate/scale."""

    param_names = ("a", "b", "mu", "sigma")
    support = "real"

    def __dist_init__(self, a, b, mu=0.0, sigma=None, lam=None):
        self.a = as_param(a)
        self.b = as_param(b)
        self.mu = as_param(mu)
        self.sigma = _lam_sigma(sigma, lam)

    def _logp(self, value, a, b, mu, sigma):
        t = (value - mu) / sigma
        denom = jnp.sqrt(a + b + t**2)
        res = (
            (a + 0.5) * jnp.log1p(t / denom)
            + (b + 0.5) * jnp.log1p(-t / denom)
            - ((a + b - 1.0) * jnp.log(2.0) + betaln(a, b)
               + 0.5 * jnp.log(a + b))
            - jnp.log(sigma)
        )
        return check_parameters(res, a > 0, b > 0, sigma > 0)

    def _logcdf(self, value, a, b, mu, sigma):
        # x = (1 + t/sqrt(a+b+t^2))/2 ~ Beta(a, b)
        t = (value - mu) / sigma
        z = 0.5 * (1.0 + t / jnp.sqrt(a + b + t**2))
        from .dist_math import safe_log

        res = safe_log(jsp.betainc(a, b, jnp.clip(z, 0.0, 1.0)))
        return check_parameters(res, a > 0, b > 0, sigma > 0)

    def _sample(self, key, shape, a, b, mu, sigma):
        # inverse of the Beta representation: t = (2u-1) sqrt(a+b)/
        # (2 sqrt(u(1-u))) with u ~ Beta(a, b)
        u = jax.random.beta(key, a, b, shape=shape, dtype=floatX())
        eps = jnp.finfo(floatX()).eps
        u = jnp.clip(u, eps, 1.0 - eps)
        t = (2.0 * u - 1.0) * jnp.sqrt(a + b) / (
            2.0 * jnp.sqrt(u * (1.0 - u))
        )
        return mu + sigma * t

    def _support_point(self, a, b, mu, sigma):
        # mode direction heuristic: mean of t = (a-b) sqrt(a+b)/2 * B terms;
        # use the median-ish transform of the Beta mean
        um = a / (a + b)
        t = (2.0 * um - 1.0) * jnp.sqrt(a + b) / (
            2.0 * jnp.sqrt(um * (1.0 - um))
        )
        return mu + sigma * t


class PolyaGamma(Continuous):
    """Polya-Gamma PG(h, z) (reference continuous.py:4140, which delegates to
    the compiled `polyagamma` package).

    On-device implementation: logp via the Devroye alternating series
    (truncated at 40 terms, accurate to ~1e-12 for x in the bulk); sampling
    via the truncated infinite-convolution-of-gammas representation with a
    moment-matched tail correction (Windle et al. 2014).
    """

    param_names = ("h", "z")
    support = "positive"

    def __dist_init__(self, h=1.0, z=0.0):
        self.h = as_param(h)
        self.z = as_param(z)

    def _logp(self, value, h, z):
        safe = jnp.where(value > 0, value, 1.0)
        ns = jnp.arange(40, dtype=floatX())
        # f(x|h,0) = 2^{h-1}/Gamma(h) sum (-1)^n [Gamma(n+h)/Gamma(n+1)]
        #            (2n+h)/sqrt(2 pi x^3) exp(-(2n+h)^2/(8x))
        coef = (
            jsp.gammaln(ns + h[..., None])
            - jsp.gammaln(ns + 1.0)
            + jnp.log(2.0 * ns + h[..., None])
        )
        expo = -((2.0 * ns + h[..., None]) ** 2) / (8.0 * safe[..., None])
        terms = jnp.exp(coef + expo)
        alt = jnp.sum(terms * jnp.where(ns % 2 == 0, 1.0, -1.0), axis=-1)
        log_f0 = (
            (h - 1.0) * jnp.log(2.0)
            - jsp.gammaln(h)
            - 0.5 * jnp.log(2.0 * jnp.pi * safe**3)
            + jnp.log(jnp.clip(alt, 1e-300, None))
        )
        # tilt: f(x|h,z) = cosh^h(z/2) exp(-x z^2/2) f(x|h,0)
        res = (
            h * jnp.log(jnp.cosh(z / 2.0)) - safe * z**2 / 2.0 + log_f0
        )
        res = jnp.where(value > 0, res, -jnp.inf)
        return check_parameters(res, h > 0)

    def _sample(self, key, shape, h, z):
        K = 200
        ks = jnp.arange(1, K + 1, dtype=floatX())
        denom = (ks - 0.5) ** 2 + (z[..., None] / (2.0 * jnp.pi)) ** 2
        g = jax.random.gamma(
            key, jnp.broadcast_to(jnp.asarray(h, floatX())[..., None],
                                  shape + (K,)),
            dtype=floatX(),
        )
        x = jnp.sum(g / denom, axis=-1) / (2.0 * jnp.pi**2)
        # moment-matched truncation correction: sum_{k>=1} 1/((k-1/2)^2 + c^2)
        # = (pi^2/ (z/... )): with c = z/(2 pi), total = pi^2 tanh(z/2)/z
        # (z -> 0 limit: pi^2/2)
        zb = jnp.broadcast_to(jnp.asarray(z, floatX()), x.shape)
        safe_z = jnp.where(jnp.abs(zb) < 1e-6, 1.0, zb)
        s_inf = jnp.where(
            jnp.abs(zb) < 1e-6,
            jnp.pi**2 / 2.0,
            jnp.pi**2 * jnp.tanh(safe_z / 2.0) / safe_z,
        )
        tail_mean = h / (2.0 * jnp.pi**2) * (
            s_inf - jnp.sum(1.0 / denom, axis=-1)
        )
        return x + jnp.maximum(tail_mean, 0.0)

    def _support_point(self, h, z):
        # E[PG(h, z)] = h/(2z) tanh(z/2); limit h/4 at z=0
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1.0, z)
        mean = jnp.where(
            jnp.abs(z) < 1e-6, h / 4.0, h / (2.0 * safe_z) * jnp.tanh(safe_z / 2.0)
        )
        return mean
