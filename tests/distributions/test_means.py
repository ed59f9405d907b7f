"""Analytic-mean battery.

Ports the case inventory of reference
tests/distributions/moments/test_means.py (scipy-oracle matrix :120,
expected-value matrix :215, undefined-moment matrix :258) against scipy
oracles. The Rice row is exact here via scaled Bessels (the reference
XFAILS it — its backend Bessel is wrong at that argument)."""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.distributions.moments import mean
from pymc_tpu.exceptions import UndefinedMomentException


@pytest.mark.parametrize(
    ["dist", "scipy_equiv", "dist_params", "scipy_params"],
    [
        [pm.AsymmetricLaplace, st.laplace_asymmetric,
         {"kappa": 2, "mu": 0.2, "b": 1 / 1.2},
         {"kappa": 2, "loc": 0.2, "scale": 1.2}],
        [pm.Bernoulli, st.bernoulli, {"p": 0.6}, {"p": 0.6}],
        [pm.Beta, st.beta, {"alpha": 3, "beta": 2}, {"a": 3, "b": 2}],
        [pm.BetaBinomial, st.betabinom, {"alpha": 3, "beta": 2, "n": 5},
         {"a": 3, "b": 2, "n": 5}],
        [pm.Binomial, st.binom, {"p": 0.6, "n": 5}, {"p": 0.6, "n": 5}],
        [pm.ChiSquared, st.chi2, {"nu": 6}, {"df": 6}],
        [pm.Dirichlet, st.dirichlet, {"a": np.ones(4)},
         {"alpha": np.ones(4)}],
        [pm.ExGaussian, st.exponnorm, {"mu": 0, "sigma": 1, "nu": 1},
         {"loc": 0, "scale": 1, "K": 1}],
        [pm.Exponential, st.expon, {"lam": 1}, {"scale": 1}],
        [pm.Gamma, st.gamma, {"alpha": 4, "beta": 3},
         {"a": 4, "scale": 1 / 3}],
        [pm.Geometric, st.geom, {"p": 0.1}, {"p": 0.1}],
        [pm.Gumbel, st.gumbel_r, {"mu": 2, "beta": 1}, {"loc": 2, "scale": 1}],
        [pm.HalfNormal, st.halfnorm, {"sigma": 1}, {"scale": 1}],
        [pm.HyperGeometric, st.hypergeom, {"N": 10, "k": 2, "n": 4},
         {"M": 10, "n": 2, "N": 4}],
        [pm.InverseGamma, st.invgamma, {"alpha": 2, "beta": 2},
         {"a": 2, "scale": 2}],
        [pm.Laplace, st.laplace, {"mu": 2, "b": 2}, {"loc": 2, "scale": 2}],
        [pm.Logistic, st.logistic, {"mu": 2, "s": 1}, {"loc": 2, "scale": 1}],
        [pm.LogNormal, st.lognorm, {"mu": 0.3, "sigma": 0.6},
         {"scale": np.exp(0.3), "s": 0.6}],
        [pm.Moyal, st.moyal, {"mu": 2, "sigma": 2}, {"loc": 2, "scale": 2}],
        [pm.Multinomial, st.multinomial, {"n": 20, "p": np.ones(6) / 6},
         {"n": 20, "p": np.ones(6) / 6}],
        [pm.MvNormal, st.multivariate_normal,
         {"mu": np.ones(3), "cov": np.eye(3)},
         {"mean": np.ones(3), "cov": np.eye(3)}],
        [pm.MvStudentT, st.multivariate_t,
         {"mu": np.ones(3), "cov": np.eye(3), "nu": 4},
         {"loc": np.ones(3), "shape": np.eye(3), "df": 4}],
        [pm.NegativeBinomial, st.nbinom, {"n": 10, "p": 0.5},
         {"n": 10, "p": 0.5}],
        [pm.Normal, st.norm, {"mu": 2, "sigma": 2}, {"loc": 2, "scale": 2}],
        [pm.Pareto, st.pareto, {"alpha": 5, "m": 2}, {"b": 5, "scale": 2}],
        [pm.Poisson, st.poisson, {"mu": 20}, {"mu": 20}],
        # reference XFAILS Rice; exact here via i0e/i1e
        [pm.Rice, st.rice, {"b": 2, "sigma": 2}, {"b": 2, "scale": 2}],
        [pm.SkewNormal, st.skewnorm, {"mu": 2, "sigma": 2, "alpha": 2},
         {"loc": 2, "scale": 2, "a": 2}],
        [pm.SkewStudentT, st.jf_skew_t,
         {"mu": 2, "sigma": 2, "a": 3, "b": 3},
         {"loc": 2, "scale": 2, "a": 3, "b": 3}],
        [pm.StudentT, st.t, {"mu": 2, "sigma": 2, "nu": 6},
         {"loc": 2, "scale": 2, "df": 6}],
        [pm.Triangular, st.triang, {"lower": -3, "upper": 2, "c": 1},
         {"loc": -3, "scale": 5, "c": 4 / 5}],
        [pm.Uniform, st.uniform, {"lower": -3, "upper": 2},
         {"loc": -3, "scale": 5}],
        [pm.VonMises, st.vonmises, {"mu": 2, "kappa": 2},
         {"loc": 2, "kappa": 2}],
        [pm.Wald, st.invgauss, {"mu": 2, "lam": 1}, {"mu": 2, "scale": 1}],
        [pm.Weibull, st.weibull_min, {"alpha": 2, "beta": 2},
         {"c": 2, "scale": 2}],
    ],
)
def test_mean_equal_to_scipy(dist, scipy_equiv, dist_params, scipy_params):
    rv = dist.dist(**dist_params)
    pymc_mean = np.asarray(mean(rv))
    scipy_rv = scipy_equiv(**scipy_params)
    try:
        scipy_mean = scipy_rv.mean()
    except TypeError:
        scipy_mean = scipy_rv.mean
    except AttributeError:
        scipy_mean = scipy_rv.loc
    if hasattr(scipy_mean, "loc"):
        scipy_mean = scipy_mean.loc
    scipy_mean = np.asarray(scipy_mean)
    if scipy_mean.shape != pymc_mean.shape and scipy_mean.size == pymc_mean.size:
        scipy_mean = scipy_mean.reshape(pymc_mean.shape)
    assert pymc_mean.shape == scipy_mean.shape
    np.testing.assert_allclose(pymc_mean, scipy_mean, rtol=1e-6)
    # tiled-shape contract: batch shapes broadcast the mean
    tiled = np.asarray(mean(dist.dist(shape=(3, *pymc_mean.shape),
                                      **dist_params)))
    np.testing.assert_allclose(
        tiled, np.tile(pymc_mean, (3,) + (1,) * pymc_mean.ndim), rtol=1e-6
    )


@pytest.mark.parametrize(
    ["dist", "dist_params", "expected"],
    [
        [pm.CAR, {"mu": np.ones(3), "W": np.eye(3), "alpha": 0.5, "tau": 1},
         np.ones(3)],
        [pm.DiracDelta, {"c": 4.0}, 4.0],
        [pm.DirichletMultinomial, {"n": 5, "a": np.ones(5)}, np.ones(5)],
        [pm.DiscreteUniform, {"lower": 3, "upper": 5}, 4.0],
        [pm.HalfStudentT, {"nu": 2, "sigma": np.sqrt(2)}, 2.0],
        [pm.KroneckerNormal,
         {"mu": np.ones(6),
          "covs": [np.array([[1.0, 0.5], [0.5, 2]]),
                   np.array([[1.0, 0.4, 0.2], [0.4, 2, 0.3],
                             [0.2, 0.3, 1]])]},
         np.ones(6)],
        [pm.Kumaraswamy, {"a": 1, "b": 1}, 0.5],
        [pm.Mixture,
         {"w": [0.3, 0.7], "comp_dists": None}, 0.7],  # comp set in test
        [pm.PolyaGamma, {"h": 1, "z": 1}, 0.23105858],
        [pm.StickBreakingWeights, {"alpha": 1, "K": 5},
         np.concatenate([0.5 ** np.arange(1, 6), [0.5**5]])],
        [pm.ZeroInflatedBinomial, {"n": 10, "p": 0.5, "psi": 0.8}, 4.0],
        [pm.ZeroInflatedNegativeBinomial,
         {"n": 10, "p": 0.5, "psi": 0.8}, 8.0],
        [pm.ZeroInflatedPoisson, {"mu": 5, "psi": 0.8}, 4.0],
    ],
)
def test_mean_equal_expected(dist, dist_params, expected):
    if dist is pm.Mixture:
        dist_params = dict(dist_params)
        dist_params["comp_dists"] = pm.Normal.dist(mu=np.array([0.0, 1.0]),
                                                   sigma=1.0)
    expected = np.asarray(expected, dtype=float)
    rv = dist.dist(**dist_params)
    pymc_mean = np.asarray(mean(rv))
    np.testing.assert_allclose(pymc_mean, expected, rtol=1e-6, atol=1e-7)


def test_lkj_corr_mean():
    packed = np.asarray(mean(pm.LKJCorr.dist(n=3, eta=1)))
    np.testing.assert_allclose(packed, np.zeros(3))
    full = np.asarray(mean(pm.LKJCorr.dist(n=3, eta=1, return_matrix=True)))
    np.testing.assert_allclose(full, np.eye(3))


def test_polyagamma_mean_z_zero_limit():
    np.testing.assert_allclose(
        float(mean(pm.PolyaGamma.dist(h=2.0, z=0.0))), 0.5, rtol=1e-7
    )


@pytest.mark.parametrize(
    ["dist", "dist_params"],
    [
        [pm.Cauchy, {"alpha": 1, "beta": 1}],
        [pm.HalfCauchy, {"beta": 1.0}],
        [pm.LogitNormal, {"mu": 2, "sigma": 1}],
        [pm.Flat, {}],
        [pm.HalfFlat, {}],
        [pm.Categorical, {"p": [0.1, 0.9]}],
    ],
)
def test_no_mean(dist, dist_params):
    with pytest.raises((UndefinedMomentException, NotImplementedError)):
        mean(dist.dist(**dist_params))
