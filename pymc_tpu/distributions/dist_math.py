"""Numeric kernels shared by distribution log-densities.

Parity: reference pymc/distributions/dist_math.py (check_parameters:50,
logpow:92, factln:109, binomln, betaln, normal_lcdf:126, normal_lccdf,
log_diff_normal_cdf, i0e/i1e:284-297). All pure JAX, NaN-safe for gradients
via the double-where pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..config import config

__all__ = [
    "check_parameters",
    "check_icdf_parameters",
    "check_icdf_value",
    "logpow",
    "factln",
    "binomln",
    "betaln",
    "normal_lcdf",
    "normal_lccdf",
    "log_normal",
    "log_diff_normal_cdf",
    "i0e",
    "i1e",
    "log_i0",
    "clipped_beta_rvs_logit",
    "safe_log",
    "safe_sqrt",
    "alltrue_elemwise",
]


def alltrue_elemwise(conds):
    out = True
    for c in conds:
        out = jnp.logical_and(out, c)
    return out


def check_parameters(logp, *conditions, msg=""):
    """Return -inf where any parameter condition fails.

    Under jit we cannot raise the reference's ParameterValueError
    (dist_math.py:50); -inf is both sampler-safe and test-checkable. The
    guard is removed entirely when config.check_bounds is False.
    """
    if not config.check_bounds or not conditions:
        return logp
    ok = alltrue_elemwise(conditions)
    neg_inf = jnp.asarray(-jnp.inf, dtype=jnp.result_type(logp))
    return jnp.where(ok, logp, neg_inf)


def check_icdf_parameters(icdf, *conditions, msg=""):
    if not config.check_bounds or not conditions:
        return icdf
    ok = alltrue_elemwise(conditions)
    return jnp.where(ok, icdf, jnp.nan)


def check_icdf_value(icdf, q):
    ok = jnp.logical_and(q >= 0, q <= 1)
    return jnp.where(ok, icdf, jnp.nan)


def safe_log(x):
    """log with NaN-safe gradient at x<=0 (still returns -inf/nan value)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.log(safe), -jnp.inf)


def safe_sqrt(x):
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def logpow(x, m):
    """m * log(x) with the convention 0**0 = 1 (reference dist_math.py:92).
    x == 0 with m > 0 gives -inf; gradient stays NaN-safe via double-where."""
    is_zero = x == 0
    safe_x = jnp.where(is_zero, 1.0, x)
    log_x = jnp.where(is_zero, -jnp.inf, jnp.log(safe_x))
    return jnp.where(m == 0, 0.0, m * log_x)


def factln(n):
    return jsp.gammaln(n + 1.0)


def binomln(n, k):
    return factln(n) - factln(k) - factln(n - k)


def betaln(a, b):
    return jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)


_SQRT2 = 1.4142135623730951
_LOG_SQRT_2PI = 0.9189385332046727  # log(sqrt(2*pi))


def normal_lcdf(mu, sigma, x):
    """log Phi((x-mu)/sigma), numerically stable in the lower tail
    (reference dist_math.py:126)."""
    z = (x - mu) / sigma
    return jsp.log_ndtr(z)


def normal_lccdf(mu, sigma, x):
    z = (x - mu) / sigma
    return jsp.log_ndtr(-z)


def log_normal(x, mean, std):
    """log N(x | mean, std^2)."""
    std = std + jnp.zeros_like(x)
    return -0.5 * ((x - mean) / std) ** 2 - jnp.log(std) - _LOG_SQRT_2PI


def log_diff_normal_cdf(mu, sigma, x, y):
    """log( Phi((x-mu)/sigma) - Phi((y-mu)/sigma) ), x > y, stable
    (reference dist_math.py:165)."""
    a = normal_lcdf(mu, sigma, x)
    b = normal_lcdf(mu, sigma, y)
    # log(exp(a) - exp(b)) = a + log1p(-exp(b - a))
    return a + jnp.log1p(-jnp.exp(jnp.minimum(b - a, -1e-12)))


def i0e(x):
    return jsp.i0e(x)


def i1e(x):
    return jsp.i1e(x)


def log_i0(x):
    """log I0(x) (modified Bessel), stable for large x."""
    return jnp.log(jsp.i0e(x)) + jnp.abs(x)


def clipped_beta_rvs_logit(key, alpha, beta, shape, dtype):
    """Beta draws clipped away from {0,1} (reference clipped_beta_rvs)."""
    draws = jax.random.beta(key, alpha, beta, shape=shape, dtype=dtype)
    eps = jnp.finfo(dtype).eps
    return jnp.clip(draws, eps, 1.0 - eps)


def icdf_bisection(logcdf_fn, q, support="real", lower=None, upper=None,
                   logpdf_fn=None, bisect_iters=70, newton_iters=4):
    """Generic jittable quantile solver for distributions lacking a closed
    form inverse CDF (reference delegates these to scipy; we solve on-device).

    Bisects in a warped coordinate u in (0,1) mapped onto the support, then
    polishes with Newton steps using the log-pdf when available. Monotonicity
    of the CDF guarantees convergence; ~70 bisection steps saturate float64.
    """
    q = jnp.asarray(q)
    dt = q.dtype if jnp.issubdtype(q.dtype, jnp.floating) else jnp.float32
    q = q.astype(dt)

    if support == "real":
        # sinh-of-tan spans ±e^(1e15) (plain tan capped at ~1/eps and could
        # not bracket heavy-tail quantiles, e.g. StudentT(nu=0.01) q=0.999
        # ~ 1e200) while staying ~linear mid-range
        def to_x(u):
            return jnp.sinh(jnp.tan(jnp.pi * (u - 0.5)))
    elif support == "positive":
        # log-space warp: x = exp(tan(pi(u - 1/2))) spans e^(±1e16) — the
        # rational u/(1-u) warp capped at ~1/eps and could not bracket
        # extreme-tail quantiles (e.g. InverseGamma(0.01, 0.01) q=0.75 is
        # ~2e28); Newton polish below restores full precision mid-range
        def to_x(u):
            return jnp.exp(jnp.tan(jnp.pi * (u - 0.5)))
    else:  # bounded interval
        lo_b = jnp.asarray(lower, dtype=dt)
        hi_b = jnp.asarray(upper, dtype=dt)

        def to_x(u):
            return lo_b + (hi_b - lo_b) * u

    eps = jnp.finfo(dt).eps
    logq = jnp.log(jnp.clip(q, eps, 1.0))
    lo = jnp.full(jnp.shape(logq), eps, dtype=dt)
    hi = jnp.full(jnp.shape(logq), 1.0 - eps, dtype=dt)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        c = logcdf_fn(to_x(mid))
        go_right = c < logq
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi))
    x = to_x(0.5 * (lo + hi))

    if logpdf_fn is not None:
        def newton(_, x):
            lc = logcdf_fn(x)
            lp = logpdf_fn(x)
            # x' = x - (cdf - q)/pdf computed in log space for stability
            step = jnp.exp(lc - lp) - jnp.exp(logq - lp)
            xn = x - step
            ok = jnp.isfinite(xn)
            if support == "positive":
                ok = jnp.logical_and(ok, xn > 0)
            elif support not in ("real",):
                ok = jnp.logical_and(ok, jnp.logical_and(xn > lower, xn < upper))
            return jnp.where(ok, xn, x)

        x = jax.lax.fori_loop(0, newton_iters, newton, x)
    return x
