"""Analytic distribution means.

Parity: reference pymc/distributions/moments/means.py (`mean(rv)` dispatch).
Implemented as closed-form expressions of the (resolved) parameters;
mathematically undefined means raise UndefinedMomentException (Cauchy, Flat,
Categorical, ... — reference means.py:133-226); unregistered families raise
NotImplementedError. The result broadcasts to the distribution's full shape
(the reference's tiled-shape contract).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy import special as jsp

from ..exceptions import UndefinedMomentException
from ..graph import FreeRV, ObservedRV

__all__ = ["mean"]


def _laguerre_half(x):
    """L_{1/2}(x) for x <= 0 via scaled Bessels (stable for large |x|):
    e^{x/2}[(1-x) I0(-x/2) - x I1(-x/2)] with e^{x/2} I_k(-x/2) = i_ke(-x/2).
    Used by the Rice mean (the reference xfails this case — its backend's
    Bessel is wrong there)."""
    z = -x / 2.0
    return (1.0 - x) * jsp.i0e(z) - x * jsp.i1e(z)


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
    "Rice": lambda p: p["sigma"] * jnp.sqrt(jnp.pi / 2.0)
    * _laguerre_half(-(p["nu"] ** 2) / (2.0 * p["sigma"] ** 2)),
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
    "NegativeBinomial": lambda p: p["n"] * (1.0 - p["p"]) / p["p"],
    "Geometric": lambda p: 1.0 / p["p"],
    "DiscreteUniform": lambda p: 0.5 * (p["lower"] + p["upper"]),
    "HyperGeometric": lambda p: p["n"] * p["k"] / p["N"],
    "AsymmetricLaplace": lambda p: p["mu"]
    + (1.0 / p["kappa"] - p["kappa"]) / p["b"],
    "HalfStudentT": lambda p: 2.0 * p["sigma"] * jnp.sqrt(p["nu"] / jnp.pi)
    * jnp.exp(jsp.gammaln((p["nu"] + 1.0) / 2.0) - jsp.gammaln(p["nu"] / 2.0))
    / (p["nu"] - 1.0),
    "SkewStudentT": lambda p: p["mu"] + p["sigma"]
    * (p["a"] - p["b"]) * jnp.sqrt(p["a"] + p["b"]) / 2.0
    * jnp.exp(
        jsp.gammaln(p["a"] - 0.5) + jsp.gammaln(p["b"] - 0.5)
        - jsp.gammaln(p["a"]) - jsp.gammaln(p["b"])
    ),
    "PolyaGamma": lambda p: jnp.where(
        p["z"] == 0.0,
        p["h"] / 4.0 + 0.0 * p["z"],
        p["h"] / (2.0 * jnp.where(p["z"] == 0.0, 1.0, p["z"]))
        * jnp.tanh(p["z"] / 2.0),
    ),
    "DiracDelta": lambda p: p["c"],
    # multivariate
    "MvNormal": lambda p: p["mu"] + 0.0 * p["chol"][..., 0],
    "MvStudentT": lambda p: p["mu"] + 0.0 * p["chol"][..., 0],
    "MatrixNormal": lambda p: p["mu"]
    + 0.0 * p["rowchol"][..., :1, :1] * p["colchol"][..., :1, :1],
    "CAR": lambda p: p["mu"] + 0.0 * p["alpha"],
    "KroneckerNormal": lambda p: p["mu"],
    "Dirichlet": lambda p: p["a"] / jnp.sum(p["a"], -1, keepdims=True),
    "Multinomial": lambda p: p["n"][..., None]
    * p["p"] / jnp.sum(p["p"], -1, keepdims=True)
    if jnp.ndim(p["n"]) else p["n"] * p["p"] / jnp.sum(p["p"], -1, keepdims=True),
    "DirichletMultinomial": lambda p: (
        p["n"][..., None] if jnp.ndim(p["n"]) else p["n"]
    ) * p["a"] / jnp.sum(p["a"], -1, keepdims=True),
}

# families whose mean is mathematically undefined (reference raises
# UndefinedMomentException from the dispatcher)
_UNDEFINED_MEAN = {
    "Cauchy", "HalfCauchy", "Flat", "HalfFlat", "Categorical", "LogitNormal",
}


def _composite_mean(dist, env):
    """Means that need more than the flat param dict."""
    name = type(dist).__name__
    if name.startswith("ZeroInflated"):
        # mixture of DiracDelta(0) (weight 1-psi) and the base (weight psi)
        from .distribution import is_node
        from ..graph import evaluate

        psi = evaluate(dist.psi, env) if is_node(dist.psi) else dist.psi
        return psi * mean(dist.base, env)
    if name == "StickBreakingWeights":
        from ..graph import evaluate

        alpha = evaluate(dist.alpha, env)
        frac = alpha / (1.0 + alpha)
        k = jnp.arange(dist.K)
        w = frac[..., None] ** k / (1.0 + alpha[..., None])
        return jnp.concatenate(
            [w, frac[..., None] ** dist.K], axis=-1
        )
    if name == "LKJCorr":
        # E[C] = I; packed strictly-lower representation -> zeros
        if dist.return_matrix:
            return jnp.broadcast_to(jnp.eye(dist.n), dist.shape)
        return jnp.zeros(dist.shape)
    if name == "Mixture":
        from ..graph import evaluate

        w = evaluate(dist.w, env)
        if getattr(dist, "comp_list", None):
            comp_means = jnp.stack(
                [mean(c, env) for c in dist.comp_list], axis=-1
            )
        else:
            comp_means = mean(dist.comp_single, env)
        return jnp.sum(w * comp_means, axis=-1)
    return None


def mean(rv, env=None):
    """Analytic mean of a distribution / RV node (reference moments.mean).

    Raises UndefinedMomentException for families whose mean does not exist
    (Cauchy, Flat, Categorical, ...) and NotImplementedError when no closed
    form is registered — same contract as the reference dispatcher. The
    result broadcasts to the distribution's full (batch + event) shape."""
    dist = rv.dist if isinstance(rv, (FreeRV, ObservedRV)) else rv
    name = type(dist).__name__
    if name in _UNDEFINED_MEAN:
        raise UndefinedMomentException(
            f"The mean of the {name} distribution is undefined"
        )
    out = _composite_mean(dist, env)
    if out is None:
        fn = _MEANS.get(name)
        if fn is None:
            raise NotImplementedError(
                f"No analytic mean registered for {name}; "
                "use support_point() for a finite representative value"
            )
        out = fn(_params(dist, env))
    shape = tuple(dist.shape)
    return jnp.broadcast_to(out, shape) if shape else jnp.asarray(out)
