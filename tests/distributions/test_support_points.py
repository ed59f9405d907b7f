"""support_point sweep: every distribution's support point must be finite
and carry finite logp — the contract `Model.initial_point` relies on
(reference tests/distributions/test_*.py assert_support_point_is_expected
coverage, condensed to the load-bearing property)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pymc_tpu as pm


def _check(dist, atol=0.0):
    sp = np.asarray(dist.support_point())
    assert np.all(np.isfinite(sp)), f"non-finite support point {sp}"
    lp = np.asarray(dist.logp(jnp.asarray(sp)))
    assert np.all(np.isfinite(lp)), f"support point has logp {lp}"
    return sp, lp


CONTINUOUS = [
    ("Uniform", lambda: pm.Uniform.dist(-1.0, 3.0), 1.0),
    ("Flat", lambda: pm.Flat.dist(), 0.0),
    ("HalfFlat", lambda: pm.HalfFlat.dist(), 1.0),
    ("Normal", lambda: pm.Normal.dist(2.0, 1.5), 2.0),
    ("TruncatedNormal", lambda: pm.TruncatedNormal.dist(0.0, 1.0, lower=-1.0, upper=2.0), None),
    ("HalfNormal", lambda: pm.HalfNormal.dist(2.0), None),
    ("SkewNormal", lambda: pm.SkewNormal.dist(mu=1.0, sigma=2.0, alpha=3.0), None),
    ("Beta", lambda: pm.Beta.dist(2.0, 3.0), 0.4),
    ("Kumaraswamy", lambda: pm.Kumaraswamy.dist(2.0, 3.0), None),
    ("Exponential", lambda: pm.Exponential.dist(0.5), 2.0),
    ("Laplace", lambda: pm.Laplace.dist(1.0, 2.0), 1.0),
    ("AsymmetricLaplace", lambda: pm.AsymmetricLaplace.dist(b=1.0, kappa=2.0, mu=0.5), None),
    ("StudentT", lambda: pm.StudentT.dist(nu=4.0, mu=1.0, sigma=2.0), 1.0),
    ("HalfStudentT", lambda: pm.HalfStudentT.dist(nu=4.0, sigma=2.0), None),
    ("SkewStudentT", lambda: pm.SkewStudentT.dist(a=2.0, b=3.0, mu=0.0, sigma=1.0), None),
    ("Cauchy", lambda: pm.Cauchy.dist(1.0, 2.0), 1.0),
    ("HalfCauchy", lambda: pm.HalfCauchy.dist(2.0), None),
    ("Gamma", lambda: pm.Gamma.dist(2.0, 1.0), 2.0),
    ("InverseGamma", lambda: pm.InverseGamma.dist(3.0, 2.0), None),
    ("Weibull", lambda: pm.Weibull.dist(2.0, 1.5), None),
    ("LogNormal", lambda: pm.LogNormal.dist(0.5, 1.0), None),
    ("ChiSquared", lambda: pm.ChiSquared.dist(4.0), None),
    ("Wald", lambda: pm.Wald.dist(mu=2.0, lam=1.0), 2.0),
    ("Pareto", lambda: pm.Pareto.dist(alpha=3.0, m=1.0), None),
    ("ExGaussian", lambda: pm.ExGaussian.dist(mu=1.0, sigma=1.0, nu=2.0), 3.0),
    ("VonMises", lambda: pm.VonMises.dist(mu=0.5, kappa=2.0), 0.5),
    ("Triangular", lambda: pm.Triangular.dist(lower=0.0, c=1.0, upper=3.0), None),
    ("Gumbel", lambda: pm.Gumbel.dist(mu=1.0, beta=2.0), None),
    ("Logistic", lambda: pm.Logistic.dist(mu=1.0, s=2.0), 1.0),
    ("LogitNormal", lambda: pm.LogitNormal.dist(mu=0.2, sigma=0.8), None),
    ("Rice", lambda: pm.Rice.dist(nu=2.0, sigma=1.0), None),
    ("Moyal", lambda: pm.Moyal.dist(mu=1.0, sigma=2.0), None),
    ("PolyaGamma", lambda: pm.PolyaGamma.dist(h=1.0, z=0.5), None),
    ("Interpolated", lambda: pm.Interpolated.dist(
        x_points=np.linspace(-3, 3, 50),
        pdf_points=np.exp(-0.5 * np.linspace(-3, 3, 50) ** 2),
    ), None),
]

DISCRETE = [
    ("Binomial", lambda: pm.Binomial.dist(n=10, p=0.3), 3.0),
    ("BetaBinomial", lambda: pm.BetaBinomial.dist(n=10, alpha=2.0, beta=3.0), None),
    ("Bernoulli", lambda: pm.Bernoulli.dist(p=0.7), 1.0),
    ("DiscreteWeibull", lambda: pm.DiscreteWeibull.dist(q=0.8, beta=1.5), None),
    ("Poisson", lambda: pm.Poisson.dist(mu=3.4), 3.0),
    ("NegativeBinomial", lambda: pm.NegativeBinomial.dist(mu=3.0, alpha=2.0), None),
    ("Geometric", lambda: pm.Geometric.dist(p=0.3), None),
    ("HyperGeometric", lambda: pm.HyperGeometric.dist(N=20, k=8, n=10), None),
    ("DiscreteUniform", lambda: pm.DiscreteUniform.dist(lower=-2, upper=7), None),
    ("Categorical", lambda: pm.Categorical.dist(p=[0.1, 0.6, 0.3]), 1.0),
    ("DiracDelta", lambda: pm.DiracDelta.dist(3), 3.0),
]

MULTIVARIATE = [
    ("MvNormal", lambda: pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3) + 0.2), None),
    ("MvStudentT", lambda: pm.MvStudentT.dist(nu=4.0, mu=np.zeros(3), scale=np.eye(3)), None),
    ("Dirichlet", lambda: pm.Dirichlet.dist(a=np.array([2.0, 3.0, 4.0])), None),
    ("Multinomial", lambda: pm.Multinomial.dist(n=10, p=np.array([0.2, 0.3, 0.5])), None),
    ("DirichletMultinomial", lambda: pm.DirichletMultinomial.dist(n=10, a=np.array([2.0, 3.0, 5.0])), None),
    ("ZeroSumNormal", lambda: pm.ZeroSumNormal.dist(sigma=1.0, shape=(4,)), None),
]

MIXTURES = [
    ("Mixture", lambda: pm.Mixture.dist(
        w=[0.4, 0.6], comp_dists=[pm.Normal.dist(-1.0, 1.0), pm.Normal.dist(2.0, 1.0)]
    ), None),
    ("NormalMixture", lambda: pm.NormalMixture.dist(
        w=[0.5, 0.5], mu=[-1.0, 1.0], sigma=[1.0, 1.0]
    ), None),
    ("ZeroInflatedPoisson", lambda: pm.ZeroInflatedPoisson.dist(psi=0.7, mu=3.0), None),
    ("ZeroInflatedBinomial", lambda: pm.ZeroInflatedBinomial.dist(psi=0.7, n=10, p=0.3), None),
    ("ZeroInflatedNegativeBinomial", lambda: pm.ZeroInflatedNegativeBinomial.dist(
        psi=0.7, mu=3.0, alpha=2.0
    ), None),
    ("HurdlePoisson", lambda: pm.HurdlePoisson.dist(psi=0.7, mu=3.0), None),
    ("HurdleGamma", lambda: pm.HurdleGamma.dist(psi=0.7, alpha=2.0, beta=1.0), None),
]

ALL_CASES = CONTINUOUS + DISCRETE + MULTIVARIATE + MIXTURES


@pytest.mark.parametrize("name,make,expected", ALL_CASES,
                         ids=[c[0] for c in ALL_CASES])
def test_support_point_finite_logp(name, make, expected):
    dist = make()
    sp, _ = _check(dist)
    if expected is not None:
        np.testing.assert_allclose(sp, expected, rtol=1e-6)


@pytest.mark.parametrize(
    "name,make",
    [
        ("Censored", lambda: pm.Censored.dist(pm.Normal.dist(0.0, 1.0), lower=-1.0, upper=1.0)),
        ("Truncated", lambda: pm.Truncated.dist(pm.Normal.dist(0.0, 1.0), lower=0.5)),
    ],
    ids=["Censored", "Truncated"],
)
def test_combinator_support_points(name, make):
    _check(make())


def test_batched_support_point_shape():
    d = pm.Gamma.dist(alpha=np.full((4, 3), 2.0), beta=1.0)
    sp = np.asarray(d.support_point())
    assert sp.shape == (4, 3)
    assert np.all(np.isfinite(sp))


def test_timeseries_support_points():
    for make in (
        lambda: pm.GaussianRandomWalk.dist(mu=0.1, sigma=1.0, steps=10,
                                           init_dist=pm.Normal.dist(0.0, 1.0)),
        lambda: pm.AR.dist(rho=[0.5], sigma=1.0, steps=10,
                           init_dist=pm.Normal.dist(0.0, 1.0)),
    ):
        d = make()
        sp = np.asarray(d.support_point())
        assert np.all(np.isfinite(sp))
