"""Continuous distribution contract tests vs the scipy oracle.

Mirrors reference tests/distributions/test_continuous.py structure using the
check_logp/check_logcdf/check_icdf harness (pymc_tpu/testing.py).
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.testing import (
    Circ,
    Domain,
    R,
    Rbig,
    Rplus,
    Rplusbig,
    Runif,
    Unit,
    check_icdf,
    check_logcdf,
    check_logp,
    check_support_point,
    continuous_random_tester,
)

Rplus_ = Domain([0, 0.5, 0.9, 1, 1.5, 2, 20, np.inf])
PosSmall = Domain([0, 0.5, 1.0, 2.0, 5.0, np.inf])
NuDom = Domain([0, 1.0, 2.0, 5.0, 30.0, np.inf])


class TestUniform:
    def test_logp(self):
        check_logp(
            pm.Uniform,
            Runif,
            {"lower": -Rplusunif_l(), "upper": Rplusunif_u()},
            lambda value, lower, upper: st.uniform.logpdf(value, lower, upper - lower),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Uniform,
            Runif,
            {"lower": -Rplusunif_l(), "upper": Rplusunif_u()},
            lambda value, lower, upper: st.uniform.logcdf(value, lower, upper - lower),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_icdf(self):
        check_icdf(
            pm.Uniform,
            {"lower": -Rplusunif_l(), "upper": Rplusunif_u()},
            lambda q, lower, upper: st.uniform.ppf(q, lower, upper - lower),
        )


def Rplusunif_l():
    return Domain([1.0, 2.0], edges=(None, None))


def Rplusunif_u():
    return Domain([3.0, 5.5], edges=(None, None))


class TestNormal:
    def test_logp(self):
        check_logp(
            pm.Normal, R, {"mu": R, "sigma": Rplus},
            lambda value, mu, sigma: st.norm.logpdf(value, mu, sigma),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Normal, R, {"mu": R, "sigma": Rplus},
            lambda value, mu, sigma: st.norm.logcdf(value, mu, sigma),
        )

    def test_icdf(self):
        check_icdf(
            pm.Normal, {"mu": R, "sigma": Rplus},
            lambda q, mu, sigma: st.norm.ppf(q, mu, sigma),
        )

    def test_tau(self):
        d = pm.Normal.dist(0.0, tau=4.0)
        np.testing.assert_allclose(
            float(pm.logp(d, 1.0)), st.norm.logpdf(1.0, 0, 0.5), rtol=1e-9
        )

    def test_random(self):
        continuous_random_tester(
            pm.Normal,
            {"mu": Domain([0.0, 2.0], edges=(None, None)),
             "sigma": Domain([0.5, 2.0], edges=(None, None))},
            lambda x, mu, sigma: st.norm.cdf(x, mu, sigma),
        )

    def test_support_point(self):
        check_support_point(pm.Normal, {"mu": R, "sigma": Rplus})


class TestHalfNormal:
    def test_logp(self):
        check_logp(
            pm.HalfNormal, Rplus, {"sigma": Rplus},
            lambda value, sigma: st.halfnorm.logpdf(value, scale=sigma),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.HalfNormal, Rplus, {"sigma": Rplus},
            lambda value, sigma: st.halfnorm.logcdf(value, scale=sigma),
        )

    def test_icdf(self):
        check_icdf(
            pm.HalfNormal, {"sigma": Rplus},
            lambda q, sigma: st.halfnorm.ppf(q, scale=sigma),
        )


class TestTruncatedNormal:
    def test_logp(self):
        def ref(value, mu, sigma, lower, upper):
            return st.truncnorm.logpdf(
                value, (lower - mu) / sigma, (upper - mu) / sigma, mu, sigma
            )

        check_logp(
            pm.TruncatedNormal,
            Domain([-1.0, -0.5, 0.0, 0.5, 1.0], edges=(None, None)),
            {
                "mu": Domain([-1.0, 0.0, 1.0], edges=(None, None)),
                "sigma": Domain([0.5, 1.0], edges=(None, None)),
                "lower": Domain([-2.0], edges=(None, None)),
                "upper": Domain([2.0], edges=(None, None)),
            },
            ref,
            skip_paramdomain_outside_edge_test=True,
        )

    def test_random(self):
        continuous_random_tester(
            pm.TruncatedNormal,
            {
                "mu": Domain([0.5], edges=(None, None)),
                "sigma": Domain([1.0], edges=(None, None)),
                "lower": Domain([-1.0], edges=(None, None)),
                "upper": Domain([2.0], edges=(None, None)),
            },
            lambda x, mu, sigma, lower, upper: st.truncnorm.cdf(
                x, (lower - mu) / sigma, (upper - mu) / sigma, mu, sigma
            ),
        )


class TestBeta:
    def test_logp(self):
        check_logp(
            pm.Beta, Unit, {"alpha": Rplus, "beta": Rplus},
            lambda value, alpha, beta: st.beta.logpdf(value, alpha, beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Beta, Unit, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.beta.logcdf(value, alpha, beta),
            decimal=5,
        )

    def test_icdf(self):
        check_icdf(
            pm.Beta,
            {"alpha": Domain([0.5, 2.0, 5.0], edges=(None, None)),
             "beta": Domain([0.5, 2.0, 5.0], edges=(None, None))},
            lambda q, alpha, beta: st.beta.ppf(q, alpha, beta),
            decimal=5,
        )

    def test_mu_sigma_parametrization(self):
        d = pm.Beta.dist(mu=0.4, sigma=0.1)
        kappa = 0.4 * 0.6 / 0.01 - 1
        np.testing.assert_allclose(
            float(pm.logp(d, 0.5)),
            st.beta.logpdf(0.5, 0.4 * kappa, 0.6 * kappa),
            rtol=1e-8,
        )


class TestKumaraswamy:
    def test_logp(self):
        def ref(value, a, b):
            return (
                np.log(a) + np.log(b)
                + (a - 1) * np.log(value)
                + (b - 1) * np.log1p(-(value**a))
            )

        check_logp(
            pm.Kumaraswamy,
            Domain([0.01, 0.1, 0.5, 0.9, 0.99], edges=(0, 1)),
            {"a": Rplusbig, "b": Rplusbig},
            ref,
        )


class TestExponential:
    def test_logp(self):
        check_logp(
            pm.Exponential, Rplus, {"lam": Rplus},
            lambda value, lam: st.expon.logpdf(value, scale=1.0 / lam),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Exponential, Rplus, {"lam": Rplus},
            lambda value, lam: st.expon.logcdf(value, scale=1.0 / lam),
        )

    def test_icdf(self):
        check_icdf(
            pm.Exponential, {"lam": Rplus},
            lambda q, lam: st.expon.ppf(q, scale=1.0 / lam),
        )


class TestLaplace:
    def test_logp(self):
        check_logp(
            pm.Laplace, R, {"mu": R, "b": Rplus},
            lambda value, mu, b: st.laplace.logpdf(value, mu, b),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Laplace, R, {"mu": R, "b": Rplus},
            lambda value, mu, b: st.laplace.logcdf(value, mu, b),
        )

    def test_icdf(self):
        check_icdf(
            pm.Laplace, {"mu": R, "b": Rplus},
            lambda q, mu, b: st.laplace.ppf(q, mu, b),
        )


class TestAsymmetricLaplace:
    def test_logp(self):
        def ref(value, b, kappa, mu):
            return st.laplace_asymmetric.logpdf(value, kappa, mu, 1.0 / b)

        check_logp(
            pm.AsymmetricLaplace,
            R,
            {"b": Rplus, "kappa": Rplus, "mu": R},
            ref,
            decimal=5,
        )


class TestLogNormal:
    def test_logp(self):
        check_logp(
            pm.LogNormal, Rplus, {"mu": R, "sigma": Rplusbig},
            lambda value, mu, sigma: st.lognorm.logpdf(value, sigma, 0, np.exp(mu)),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.LogNormal, Rplus, {"mu": R, "sigma": Rplusbig},
            lambda value, mu, sigma: st.lognorm.logcdf(value, sigma, 0, np.exp(mu)),
        )

    def test_icdf(self):
        check_icdf(
            pm.LogNormal, {"mu": R, "sigma": Rplusbig},
            lambda q, mu, sigma: st.lognorm.ppf(q, sigma, 0, np.exp(mu)),
        )


class TestStudentT:
    def test_logp(self):
        check_logp(
            pm.StudentT, R, {"nu": NuDom, "mu": R, "sigma": Rplus},
            lambda value, nu, mu, sigma: st.t.logpdf(value, nu, mu, sigma),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.StudentT, R, {"nu": NuDom, "mu": R, "sigma": Rplus},
            lambda value, nu, mu, sigma: st.t.logcdf(value, nu, mu, sigma),
            decimal=5,
        )

    def test_icdf(self):
        check_icdf(
            pm.StudentT,
            {"nu": Domain([2.0, 5.0, 30.0], edges=(None, None)),
             "mu": Domain([0.0, 1.0], edges=(None, None)),
             "sigma": Domain([1.0, 2.0], edges=(None, None))},
            lambda q, nu, mu, sigma: st.t.ppf(q, nu, mu, sigma),
            decimal=4,
        )


class TestHalfStudentT:
    def test_logp(self):
        def ref(value, nu, sigma):
            return st.t.logpdf(value, nu, 0, sigma) + np.log(2)

        check_logp(pm.HalfStudentT, Rplus, {"nu": NuDom, "sigma": Rplus}, ref)


class TestPareto:
    def test_logp(self):
        check_logp(
            pm.Pareto,
            Domain([1.0, 1.5, 2.0, 5.0, np.inf], edges=(1.0, np.inf)),
            {"alpha": Rplusbig, "m": Domain([1.0], edges=(None, None))},
            lambda value, alpha, m: st.pareto.logpdf(value, alpha, scale=m),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Pareto,
            Domain([1.0, 1.5, 2.0, 5.0, np.inf], edges=(1.0, np.inf)),
            {"alpha": Rplusbig, "m": Domain([1.0], edges=(None, None))},
            lambda value, alpha, m: st.pareto.logcdf(value, alpha, scale=m),
        )

    def test_icdf(self):
        check_icdf(
            pm.Pareto,
            {"alpha": Rplusbig, "m": Domain([1.0, 2.0], edges=(None, None))},
            lambda q, alpha, m: st.pareto.ppf(q, alpha, scale=m),
        )


class TestCauchy:
    def test_logp(self):
        check_logp(
            pm.Cauchy, R, {"alpha": R, "beta": Rplusbig},
            lambda value, alpha, beta: st.cauchy.logpdf(value, alpha, beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Cauchy, R, {"alpha": R, "beta": Rplusbig},
            lambda value, alpha, beta: st.cauchy.logcdf(value, alpha, beta),
        )

    def test_icdf(self):
        check_icdf(
            pm.Cauchy, {"alpha": R, "beta": Rplusbig},
            lambda q, alpha, beta: st.cauchy.ppf(q, alpha, beta),
        )


class TestHalfCauchy:
    def test_logp(self):
        check_logp(
            pm.HalfCauchy, Rplus, {"beta": Rplusbig},
            lambda value, beta: st.halfcauchy.logpdf(value, scale=beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.HalfCauchy, Rplus, {"beta": Rplusbig},
            lambda value, beta: st.halfcauchy.logcdf(value, scale=beta),
        )

    def test_icdf(self):
        check_icdf(
            pm.HalfCauchy, {"beta": Rplusbig},
            lambda q, beta: st.halfcauchy.ppf(q, scale=beta),
        )


class TestGamma:
    def test_logp(self):
        check_logp(
            pm.Gamma, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.gamma.logpdf(value, alpha, scale=1.0 / beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Gamma, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.gamma.logcdf(value, alpha, scale=1.0 / beta),
        )

    def test_icdf(self):
        check_icdf(
            pm.Gamma,
            {"alpha": Domain([0.5, 2.0, 10.0], edges=(None, None)),
             "beta": Domain([0.5, 2.0], edges=(None, None))},
            lambda q, alpha, beta: st.gamma.ppf(q, alpha, scale=1.0 / beta),
            decimal=5,
        )

    def test_random(self):
        continuous_random_tester(
            pm.Gamma,
            {"alpha": Domain([2.0], edges=(None, None)),
             "beta": Domain([3.0], edges=(None, None))},
            lambda x, alpha, beta: st.gamma.cdf(x, alpha, scale=1.0 / beta),
        )


class TestInverseGamma:
    def test_logp(self):
        check_logp(
            pm.InverseGamma, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.invgamma.logpdf(value, alpha, scale=beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.InverseGamma, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.invgamma.logcdf(value, alpha, scale=beta),
        )


class TestChiSquared:
    def test_logp(self):
        check_logp(
            pm.ChiSquared, Rplus, {"nu": PosSmall},
            lambda value, nu: st.chi2.logpdf(value, nu),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.ChiSquared, Rplus, {"nu": PosSmall},
            lambda value, nu: st.chi2.logcdf(value, nu),
        )


class TestWeibull:
    def test_logp(self):
        check_logp(
            pm.Weibull, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.weibull_min.logpdf(value, alpha, scale=beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Weibull, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.weibull_min.logcdf(value, alpha, scale=beta),
        )

    def test_icdf(self):
        check_icdf(
            pm.Weibull, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda q, alpha, beta: st.weibull_min.ppf(q, alpha, scale=beta),
        )


class TestExGaussian:
    def test_logp(self):
        check_logp(
            pm.ExGaussian,
            R,
            {"mu": R,
             "sigma": Domain([0.5, 1.0, 2.0], edges=(None, None)),
             "nu": Domain([0.5, 1.0, 3.0], edges=(None, None))},
            lambda value, mu, sigma, nu: st.exponnorm.logpdf(
                value, nu / sigma, mu, sigma
            ),
            decimal=5,
        )


class TestVonMises:
    def test_logp(self):
        check_logp(
            pm.VonMises, Circ, {"mu": Circ, "kappa": Rplusbig},
            lambda value, mu, kappa: st.vonmises.logpdf(value, kappa, mu),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_random(self):
        continuous_random_tester(
            pm.VonMises,
            {"mu": Domain([0.5], edges=(None, None)),
             "kappa": Domain([2.0], edges=(None, None))},
            lambda x, mu, kappa: st.vonmises.cdf(x, kappa, mu),
        )


class TestSkewNormal:
    def test_logp(self):
        check_logp(
            pm.SkewNormal, R, {"mu": R, "sigma": Rplusbig, "alpha": R},
            lambda value, mu, sigma, alpha: st.skewnorm.logpdf(value, alpha, mu, sigma),
            decimal=5,
        )


class TestTriangular:
    def test_logp(self):
        def ref(value, lower, c, upper):
            return st.triang.logpdf(
                value, (c - lower) / (upper - lower), lower, upper - lower
            )

        check_logp(
            pm.Triangular,
            Domain([-1.0, 0.0, 0.3, 1.5], edges=(None, None)),
            {"lower": Domain([-2.0], edges=(None, None)),
             "c": Domain([0.0, 0.5], edges=(None, None)),
             "upper": Domain([2.0], edges=(None, None))},
            ref,
            skip_paramdomain_outside_edge_test=True,
        )

    def test_icdf(self):
        check_icdf(
            pm.Triangular,
            {"lower": Domain([-2.0], edges=(None, None)),
             "c": Domain([0.5], edges=(None, None)),
             "upper": Domain([2.0], edges=(None, None))},
            lambda q, lower, c, upper: st.triang.ppf(
                q, (c - lower) / (upper - lower), lower, upper - lower
            ),
        )


class TestGumbel:
    def test_logp(self):
        check_logp(
            pm.Gumbel, R, {"mu": R, "beta": Rplusbig},
            lambda value, mu, beta: st.gumbel_r.logpdf(value, mu, beta),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Gumbel, R, {"mu": R, "beta": Rplusbig},
            lambda value, mu, beta: st.gumbel_r.logcdf(value, mu, beta),
        )

    def test_icdf(self):
        check_icdf(
            pm.Gumbel, {"mu": R, "beta": Rplusbig},
            lambda q, mu, beta: st.gumbel_r.ppf(q, mu, beta),
        )


class TestLogistic:
    def test_logp(self):
        check_logp(
            pm.Logistic, R, {"mu": R, "s": Rplusbig},
            lambda value, mu, s: st.logistic.logpdf(value, mu, s),
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Logistic, R, {"mu": R, "s": Rplusbig},
            lambda value, mu, s: st.logistic.logcdf(value, mu, s),
        )

    def test_icdf(self):
        check_icdf(
            pm.Logistic, {"mu": R, "s": Rplusbig},
            lambda q, mu, s: st.logistic.ppf(q, mu, s),
        )


class TestLogitNormal:
    def test_logp(self):
        from scipy.special import logit

        def ref(value, mu, sigma):
            return (
                st.norm.logpdf(logit(value), mu, sigma)
                - np.log(value)
                - np.log1p(-value)
            )

        check_logp(
            pm.LogitNormal,
            Domain([0.01, 0.1, 0.5, 0.9, 0.99], edges=(0, 1)),
            {"mu": R, "sigma": Rplusbig},
            ref,
        )


class TestMoyal:
    def test_logp(self):
        check_logp(
            pm.Moyal, R, {"mu": R, "sigma": Rplusbig},
            lambda value, mu, sigma: st.moyal.logpdf(value, mu, sigma),
            compare_finite_only=True,  # scipy underflows to -inf in deep tail
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Moyal, R, {"mu": R, "sigma": Rplusbig},
            lambda value, mu, sigma: st.moyal.logcdf(value, mu, sigma),
        )

    def test_icdf(self):
        check_icdf(
            pm.Moyal, {"mu": R, "sigma": Rplusbig},
            lambda q, mu, sigma: st.moyal.ppf(q, mu, sigma),
            decimal=5,
        )


class TestWald:
    def test_logp(self):
        check_logp(
            pm.Wald, Rplus, {"mu": Rplusbig, "lam": Rplusbig},
            lambda value, mu, lam: st.invgauss.logpdf(
                value, mu / lam, scale=lam
            ),
            decimal=5,
        )


class TestRice:
    def test_logp(self):
        check_logp(
            pm.Rice, Rplus,
            {"nu": Domain([0.5, 1.0, 2.0], edges=(None, None)),
             "sigma": Domain([0.5, 1.0, 2.0], edges=(None, None))},
            lambda value, nu, sigma: st.rice.logpdf(value, nu / sigma, scale=sigma),
            decimal=5,
            skip_paramdomain_outside_edge_test=True,
            compare_finite_only=True,  # scipy overflows i0 in deep tail
        )


class TestInterpolated:
    def test_logp(self):
        x = np.linspace(-3, 3, 100)
        pdf = st.norm.pdf(x)
        d = pm.Interpolated.dist(x_points=x, pdf_points=pdf)
        vals = np.array([-2.0, -0.5, 0.0, 1.0, 2.5])
        ours = np.asarray(pm.logp(d, vals))
        np.testing.assert_allclose(ours, st.norm.logpdf(vals), atol=0.01)


class TestSupportPoints:
    @pytest.mark.parametrize(
        "dist,params",
        [
            (pm.Gamma, {"alpha": Rplusbig, "beta": Rplusbig}),
            (pm.Beta, {"alpha": Rplusbig, "beta": Rplusbig}),
            (pm.Exponential, {"lam": Rplusbig}),
            (pm.HalfCauchy, {"beta": Rplusbig}),
            (pm.LogNormal, {"mu": R, "sigma": Rplusbig}),
            (pm.Weibull, {"alpha": Rplusbig, "beta": Rplusbig}),
            (pm.InverseGamma, {"alpha": Rplusbig, "beta": Rplusbig}),
            (pm.Logistic, {"mu": R, "s": Rplusbig}),
        ],
    )
    def test_support_point(self, dist, params):
        check_support_point(dist, params)

    def test_shapes(self):
        d = pm.Normal.dist(np.zeros((3, 2)), 1.0)
        assert d.shape == (3, 2)
        assert d.support_point().shape == (3, 2)
        d2 = pm.Normal.dist(0.0, 1.0, shape=(4, 3))
        assert d2.sample(pm.draw.__globals__["jax"].random.PRNGKey(0)).shape == (4, 3)


class TestFlat:
    def test_logp_zero_everywhere(self):
        d = pm.Flat.dist()
        for v in (-100.0, 0.0, 7.3):
            assert float(pm.logp(d, v)) == 0.0
        assert float(pm.logcdf(d, 0.0)) == np.log(0.5)

    def test_halfflat(self):
        d = pm.HalfFlat.dist()
        assert float(pm.logp(d, 2.0)) == 0.0
        assert float(pm.logp(d, -1.0)) == -np.inf

    def test_sampling_raises(self):
        import jax

        with pytest.raises(Exception):
            np.asarray(pm.Flat.dist().sample(jax.random.PRNGKey(0)))


class TestSkewStudentT:
    def test_logp_vs_scipy_jf_skew_t(self):
        # Jones & Faddy (2003) skew-t: scipy.stats.jf_skew_t(a, b)
        a, b, mu, sigma = 2.0, 3.0, 0.5, 1.5
        d = pm.SkewStudentT.dist(a=a, b=b, mu=mu, sigma=sigma)
        x = np.linspace(-4, 5, 11)
        expected = st.jf_skew_t.logpdf(x, a, b, loc=mu, scale=sigma)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), expected, rtol=1e-6
        )

    def test_logcdf(self):
        a, b = 3.0, 2.0
        d = pm.SkewStudentT.dist(a=a, b=b, mu=0.0, sigma=1.0)
        x = np.linspace(-3, 3, 7)
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(d, x)), st.jf_skew_t.logcdf(x, a, b),
            rtol=1e-5, atol=1e-8,
        )

    def test_random_moments(self):
        import jax

        a, b = 4.0, 4.0  # symmetric: mean 0 after centering
        d = pm.SkewStudentT.dist(a=a, b=b, mu=1.0, sigma=2.0, size=(50_000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        ref = st.jf_skew_t.mean(a, b, loc=1.0, scale=2.0)
        np.testing.assert_allclose(draws.mean(), ref, atol=0.05)


class TestPolyaGamma:
    def test_normalization_and_mean(self):
        # PG(b, 0): E[X] = b/4; PG(b, c): E[X] = b/(2c) tanh(c/2)
        from scipy import integrate

        for b, c in [(1.0, 0.0), (1.0, 2.0), (2.5, 1.0)]:
            d = pm.PolyaGamma.dist(h=b, z=c)
            f = lambda x: float(np.exp(pm.logp(d, x)))
            total, _ = integrate.quad(f, 1e-8, 40, limit=200)
            np.testing.assert_allclose(total, 1.0, rtol=1e-3,
                                       err_msg=f"b={b} c={c}")
            mean, _ = integrate.quad(lambda x: x * f(x), 1e-8, 40, limit=200)
            expected = b / 4.0 if c == 0 else b / (2 * c) * np.tanh(c / 2)
            np.testing.assert_allclose(mean, expected, rtol=1e-3)

    def test_random_mean(self):
        import jax

        d = pm.PolyaGamma.dist(h=1.0, z=1.5, size=(40_000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        expected = 1.0 / (2 * 1.5) * np.tanh(0.75)
        np.testing.assert_allclose(draws.mean(), expected, rtol=0.03)

    def test_outside_support(self):
        d = pm.PolyaGamma.dist(h=1.0, z=0.0)
        assert float(pm.logp(d, -0.5)) == -np.inf
