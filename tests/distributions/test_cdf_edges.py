"""CDF/CCDF edge contracts across the distribution inventory:
logcdf(+inf) = 0, logcdf(-inf) = -inf, logccdf mirrors, logp outside the
support = -inf (reference check_logcdf ultimate/beyond-domain checks,
pymc/testing.py:420-537)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pymc_tpu as pm

CASES = [
    ("Normal", lambda: pm.Normal.dist(1.0, 2.0), None),
    ("Uniform", lambda: pm.Uniform.dist(-1.0, 3.0), (-1.0, 3.0)),
    ("HalfNormal", lambda: pm.HalfNormal.dist(2.0), (0.0, None)),
    ("Beta", lambda: pm.Beta.dist(2.0, 3.0), (0.0, 1.0)),
    ("Exponential", lambda: pm.Exponential.dist(0.5), (0.0, None)),
    ("Laplace", lambda: pm.Laplace.dist(1.0, 2.0), None),
    ("StudentT", lambda: pm.StudentT.dist(4.0, mu=1.0, sigma=2.0), None),
    ("Cauchy", lambda: pm.Cauchy.dist(1.0, 2.0), None),
    ("HalfCauchy", lambda: pm.HalfCauchy.dist(2.0), (0.0, None)),
    ("Gamma", lambda: pm.Gamma.dist(2.0, 1.0), (0.0, None)),
    ("InverseGamma", lambda: pm.InverseGamma.dist(3.0, 2.0), (0.0, None)),
    ("Weibull", lambda: pm.Weibull.dist(2.0, 1.5), (0.0, None)),
    ("LogNormal", lambda: pm.LogNormal.dist(0.5, 1.0), (0.0, None)),
    ("ChiSquared", lambda: pm.ChiSquared.dist(4.0), (0.0, None)),
    ("Wald", lambda: pm.Wald.dist(mu=2.0, lam=1.0), (0.0, None)),
    ("Pareto", lambda: pm.Pareto.dist(alpha=3.0, m=1.0), (1.0, None)),
    ("Gumbel", lambda: pm.Gumbel.dist(mu=1.0, beta=2.0), None),
    ("Logistic", lambda: pm.Logistic.dist(mu=1.0, s=2.0), None),
    ("Moyal", lambda: pm.Moyal.dist(mu=1.0, sigma=2.0), None),
    ("Triangular", lambda: pm.Triangular.dist(lower=0.0, c=1.0, upper=3.0),
     (0.0, 3.0)),
    ("ExGaussian", lambda: pm.ExGaussian.dist(mu=1.0, sigma=1.0, nu=2.0),
     None),
    ("SkewNormal", lambda: pm.SkewNormal.dist(mu=1.0, sigma=2.0, alpha=3.0),
     None),
    ("Kumaraswamy", lambda: pm.Kumaraswamy.dist(2.0, 3.0), (0.0, 1.0)),
    ("LogitNormal", lambda: pm.LogitNormal.dist(mu=0.2, sigma=0.8),
     (0.0, 1.0)),
    ("AsymmetricLaplace",
     lambda: pm.AsymmetricLaplace.dist(b=1.0, kappa=2.0, mu=0.5), None),
]


@pytest.mark.parametrize("name,make,support", CASES,
                         ids=[c[0] for c in CASES])
def test_logcdf_at_infinities(name, make, support):
    d = make()
    try:
        hi = float(np.asarray(d.logcdf(jnp.asarray(np.inf))))
        lo = float(np.asarray(d.logcdf(jnp.asarray(-np.inf))))
    except NotImplementedError:
        # matches the reference: SkewNormal/AsymmetricLaplace ship no logcdf
        pytest.skip("no logcdf (reference parity)")
    np.testing.assert_allclose(hi, 0.0, atol=1e-9)
    assert lo == -np.inf, lo


@pytest.mark.parametrize("name,make,support", CASES,
                         ids=[c[0] for c in CASES])
def test_logccdf_at_infinities(name, make, support):
    d = make()
    try:
        lo = float(np.asarray(d.logccdf(jnp.asarray(-np.inf))))
        hi = float(np.asarray(d.logccdf(jnp.asarray(np.inf))))
    except NotImplementedError:
        pytest.skip("no logccdf")
    np.testing.assert_allclose(lo, 0.0, atol=1e-9)
    assert hi == -np.inf, hi


@pytest.mark.parametrize("name,make,support", CASES,
                         ids=[c[0] for c in CASES])
def test_logp_outside_support(name, make, support):
    if support is None:
        pytest.skip("full real support")
    d = make()
    lower, upper = support
    if lower is not None:
        below = lower - 0.5
        lp = float(np.asarray(d.logp(jnp.asarray(below))))
        assert lp == -np.inf, (name, lp)
    if upper is not None:
        above = upper + 0.5
        lp = float(np.asarray(d.logp(jnp.asarray(above))))
        assert lp == -np.inf, (name, lp)


@pytest.mark.parametrize("name,make,support", CASES,
                         ids=[c[0] for c in CASES])
def test_cdf_boundary_values(name, make, support):
    """At a finite lower bound the CDF is 0; at a finite upper bound it is 1."""
    if support is None:
        pytest.skip("full real support")
    d = make()
    lower, upper = support
    if lower is not None:
        lp = float(np.asarray(d.logcdf(jnp.asarray(lower - 1e-9))))
        assert lp == -np.inf or lp < -15.0, (name, lp)
    if upper is not None:
        lp = float(np.asarray(d.logcdf(jnp.asarray(upper))))
        np.testing.assert_allclose(lp, 0.0, atol=1e-6)


DISCRETE_CASES = [
    ("Bernoulli", lambda: pm.Bernoulli.dist(p=0.7), (0, 1)),
    ("Binomial", lambda: pm.Binomial.dist(n=10, p=0.3), (0, 10)),
    ("BetaBinomial", lambda: pm.BetaBinomial.dist(n=10, alpha=2.0, beta=3.0),
     (0, 10)),
    ("Poisson", lambda: pm.Poisson.dist(mu=3.0), (0, None)),
    ("NegativeBinomial", lambda: pm.NegativeBinomial.dist(mu=3.0, alpha=2.0),
     (0, None)),
    ("Geometric", lambda: pm.Geometric.dist(p=0.3), (1, None)),
    ("HyperGeometric", lambda: pm.HyperGeometric.dist(N=20, k=8, n=10),
     (0, 8)),
    ("DiscreteUniform", lambda: pm.DiscreteUniform.dist(lower=-2, upper=7),
     (-2, 7)),
    ("DiscreteWeibull", lambda: pm.DiscreteWeibull.dist(q=0.8, beta=1.5),
     (0, None)),
    ("Categorical", lambda: pm.Categorical.dist(p=[0.2, 0.3, 0.5]), (0, 2)),
]


@pytest.mark.parametrize("name,make,support", DISCRETE_CASES,
                         ids=[c[0] for c in DISCRETE_CASES])
def test_discrete_logcdf_infinities(name, make, support):
    d = make()
    try:
        hi = float(np.asarray(d.logcdf(jnp.asarray(np.inf))))
        lo = float(np.asarray(d.logcdf(jnp.asarray(-np.inf))))
    except NotImplementedError:
        pytest.skip("no logcdf (reference parity)")
    np.testing.assert_allclose(hi, 0.0, atol=1e-9)
    assert lo == -np.inf, lo


@pytest.mark.parametrize("name,make,support", DISCRETE_CASES,
                         ids=[c[0] for c in DISCRETE_CASES])
def test_discrete_logp_outside_support(name, make, support):
    d = make()
    lower, upper = support
    lp = float(np.asarray(d.logp(jnp.asarray(lower - 1))))
    assert lp == -np.inf, (name, "below", lp)
    if upper is not None:
        lp = float(np.asarray(d.logp(jnp.asarray(upper + 1))))
        assert lp == -np.inf, (name, "above", lp)
