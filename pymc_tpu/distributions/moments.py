"""Analytic distribution means.

Parity: reference pymc/distributions/moments/means.py (`mean(rv)` dispatch).
Implemented as closed-form expressions of the (resolved) parameters; raises
NotImplementedError where the reference has no registered mean either.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy import special as jsp

from ..graph import FreeRV, ObservedRV

__all__ = ["mean"]


def _params(dist, env=None):
    return dict(zip(dist.param_names, dist.resolve_params(env)))


_MEANS = {
    "Normal": lambda p: p["mu"] + 0.0 * p["sigma"],
    "TruncatedNormal": None,
    "HalfNormal": lambda p: p["sigma"] * jnp.sqrt(2.0 / jnp.pi),
    "Uniform": lambda p: 0.5 * (p["lower"] + p["upper"]),
    "Beta": lambda p: p["alpha"] / (p["alpha"] + p["beta"]),
    "Exponential": lambda p: 1.0 / p["lam"],
    "Laplace": lambda p: p["mu"] + 0.0 * p["b"],
    "StudentT": lambda p: p["mu"] + 0.0 * p["nu"],
    "Cauchy": None,
    "HalfCauchy": None,
    "Gamma": lambda p: p["alpha"] / p["beta"],
    "InverseGamma": lambda p: p["beta"] / (p["alpha"] - 1.0),
    "Weibull": lambda p: p["beta"] * jnp.exp(jsp.gammaln(1.0 + 1.0 / p["alpha"])),
    "LogNormal": lambda p: jnp.exp(p["mu"] + 0.5 * p["sigma"] ** 2),
    "ChiSquared": lambda p: p["nu"],
    "Wald": lambda p: p["mu"],
    "Pareto": lambda p: jnp.where(
        p["alpha"] > 1, p["alpha"] * p["m"] / (p["alpha"] - 1.0), jnp.inf
    ),
    "ExGaussian": lambda p: p["mu"] + p["nu"],
    "VonMises": lambda p: p["mu"] + 0.0 * p["kappa"],
    "SkewNormal": lambda p: p["mu"] + p["sigma"] * jnp.sqrt(2.0 / jnp.pi)
    * p["alpha"] / jnp.sqrt(1.0 + p["alpha"] ** 2),
    "Triangular": lambda p: (p["lower"] + p["c"] + p["upper"]) / 3.0,
    "Gumbel": lambda p: p["mu"] + 0.5772156649015329 * p["beta"],
    "Logistic": lambda p: p["mu"] + 0.0 * p["s"],
    "LogitNormal": None,
    "Rice": None,
    "Moyal": lambda p: p["mu"] + p["sigma"]
    * (0.5772156649015329 + jnp.log(2.0)),
    "Kumaraswamy": lambda p: p["b"] * jnp.exp(
        jsp.gammaln(1.0 + 1.0 / p["a"]) + jsp.gammaln(p["b"])
        - jsp.gammaln(1.0 + 1.0 / p["a"] + p["b"])
    ),
    # discrete
    "Binomial": lambda p: p["n"] * p["p"],
    "BetaBinomial": lambda p: p["n"] * p["alpha"] / (p["alpha"] + p["beta"]),
    "Bernoulli": lambda p: p["p"],
    "Poisson": lambda p: p["mu"],
    "NegativeBinomial": lambda p: p["mu"],
    "Geometric": lambda p: 1.0 / p["p"],
    "DiscreteUniform": lambda p: 0.5 * (p["lower"] + p["upper"]),
    "HyperGeometric": lambda p: p["n"] * p["k"] / p["N"],
    # multivariate
    "MvNormal": lambda p: p["mu"] + 0.0 * p["chol"][..., 0],
    "Dirichlet": lambda p: p["a"] / jnp.sum(p["a"], -1, keepdims=True),
    "Multinomial": lambda p: p["n"][..., None]
    * p["p"] / jnp.sum(p["p"], -1, keepdims=True)
    if jnp.ndim(p["n"]) else p["n"] * p["p"] / jnp.sum(p["p"], -1, keepdims=True),
}


def mean(rv, env=None):
    """Analytic mean of a distribution / RV node (reference moments.mean).

    Raises NotImplementedError when no closed form is registered — same
    contract as the reference dispatcher."""
    dist = rv.dist if isinstance(rv, (FreeRV, ObservedRV)) else rv
    fn = _MEANS.get(type(dist).__name__)
    if fn is None:
        raise NotImplementedError(
            f"No analytic mean registered for {type(dist).__name__}; "
            "use support_point() for a finite representative value"
        )
    return fn(_params(dist, env))
