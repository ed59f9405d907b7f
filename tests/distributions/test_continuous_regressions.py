"""Extreme-parameter density/cdf/icdf regression tables for continuous
families.

Case inventory ported (values, not code) from reference
tests/distributions/test_continuous.py: the R-gamlss Wald logp table
(:351-380 — includes rows where scipy has no matching parametrization), the
R-gamlss ExGaussian logcdf table (:808-832 — includes THREE rows where scipy
itself fails or previous float implementations broke), the extreme-sigma
LogNormal icdf domain (:525-533), Wald mu/alpha logcdf (:343-349), Triangular
logcdf (:1430ish), InverseGamma/HalfStudentT/SkewStudentT icdf, and the
beta mu/sigma safe-domain parametrization (:390-402). Oracles are literal R
package values (gamlss dIG/pexGAUS) or scipy closed forms.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax

import pymc_tpu as pm
from pymc_tpu.testing import (
    Domain,
    R,
    Rplus,
    Rplusbig,
    Unit,
    check_icdf,
    check_logcdf,
    check_logp,
)


class TestWaldRegressions:
    # Log probabilities calculated with the dIG function of the R package
    # gamlss (doi: 10.1111/j.1467-9876.2005.00510.x) — the reference's
    # regression table, covering the mu/lam, mu-only, lam/phi, and
    # shifted-alpha parametrizations (several rows have NO scipy equivalent).
    WALD_POINTS = [
        (0.5, 0.001, 0.5, None, 0.0, -124500.7257914),
        (1.0, 0.5, 0.001, None, 0.0, -4.3733162),
        (2.0, 1.0, None, None, 0.0, -2.2086593),
        (5.0, 2.0, 2.5, None, 0.0, -3.4374500),
        (7.5, 5.0, None, 1.0, 0.0, -3.2199074),
        (15.0, 10.0, None, 0.75, 0.0, -4.0360623),
        (50.0, 15.0, None, 0.66666, 0.0, -6.1801249),
        (1.0, 0.5, 0.001, None, 0.5, -3.3330954),
        (2.0, 1.0, None, None, 1.0, -0.9189385),
        (5.0, 2.0, 2.5, None, 2.0, -2.2128783),
        (7.5, 5.0, None, 1.0, 2.5, -2.5283764),
        (15.0, 10.0, None, 0.75, 5.0, -3.3653647),
        (50.0, 15.0, None, 0.666666, 10.0, -5.6481874),
    ]

    @pytest.mark.parametrize("value,mu,lam,phi,alpha,logp_want", WALD_POINTS)
    def test_wald_logp_custom_points(self, value, mu, lam, phi, alpha,
                                     logp_want):
        d = pm.Wald.dist(mu=mu, lam=lam, phi=phi, alpha=alpha)
        np.testing.assert_allclose(
            float(d.logp(value)), logp_want, rtol=2e-7, atol=1e-6
        )

    def test_wald_logcdf_shifted(self):
        """mu/alpha form vs scipy invgauss with loc shift."""
        check_logcdf(
            pm.Wald,
            Rplus,
            {"mu": Rplus, "alpha": Rplus},
            lambda value, mu, alpha: st.invgauss.logcdf(value, mu=mu,
                                                        loc=alpha),
        )

    def test_wald_logp_shifted(self):
        check_logp(
            pm.Wald,
            Rplus,
            {"mu": Rplus, "alpha": Rplus},
            lambda value, mu, alpha: st.invgauss.logpdf(value, mu=mu,
                                                        loc=alpha),
            decimal=5,
        )


class TestExGaussianRegressions:
    # pexGAUS values from R gamlss; the last three rows are where scipy
    # (first) and previous 32/64-bit implementations (next two) fail.
    EXG_CDF_POINTS = [
        (0.5, -50.000, 0.500, 0.500, 0.0000000),
        (1.0, -1.000, 0.001, 0.001, 0.0000000),
        (2.0, 0.001, 1.000, 1.000, -0.2365674),
        (5.0, 0.500, 2.500, 2.500, -0.2886489),
        (7.5, 2.000, 5.000, 5.000, -0.5655104),
        (15.0, 5.000, 7.500, 7.500, -0.4545255),
        (50.0, 50.000, 10.000, 10.000, -1.433714),
        (1000.0, 500.000, 10.000, 20.000, -1.573708e-11),
        (0.01, 0.01, 100.0, 0.01, -0.69314718),
        (-0.43402407, 0.0, 0.1, 0.1, -13.59615423),
        (-0.72402009, 0.0, 0.1, 0.1, -31.26571842),
    ]

    @pytest.mark.parametrize("value,mu,sigma,nu,logcdf_want", EXG_CDF_POINTS)
    def test_ex_gaussian_cdf_custom_points(self, value, mu, sigma, nu,
                                           logcdf_want):
        d = pm.ExGaussian.dist(mu=mu, sigma=sigma, nu=nu)
        np.testing.assert_allclose(
            float(d.logcdf(value)), logcdf_want, rtol=1e-6, atol=1e-6
        )

    def test_ex_gaussian_cdf_monotone_tails(self):
        """logcdf must stay finite, monotone, and <= 0 across extreme
        values (reference outside-edges sweep)."""
        d = pm.ExGaussian.dist(mu=0.0, sigma=1.0, nu=2.0)
        vals = np.array([-100.0, -10.0, -1.0, 0.0, 1.0, 10.0, 100.0])
        lc = np.asarray(jax.device_get(pm.logcdf(d, vals)))
        assert np.all(lc[:-1] <= lc[1:] + 1e-12)
        assert np.all(lc <= 1e-12)
        assert np.all(np.isfinite(lc[1:]))


class TestExtremeICDF:
    def test_lognormal_icdf_extreme_sigma(self):
        """sigma up to 9: exponentiating the normal quantile amplifies
        relative error — the reference caps the domain at 9 and loosens to
        4 decimals (test_continuous.py:525-533)."""
        custom_rplusbig = Domain([0, 0.5, 0.9, 0.99, 1, 1.5, 2, 9, np.inf])
        check_icdf(
            pm.LogNormal,
            {"mu": R, "sigma": custom_rplusbig},
            lambda q, mu, sigma: st.lognorm.ppf(q, sigma, 0, np.exp(mu)),
            decimal=4,
        )

    def test_inverse_gamma_icdf(self):
        check_icdf(
            pm.InverseGamma,
            {"alpha": Rplus, "beta": Rplus},
            lambda q, alpha, beta: st.invgamma.ppf(q, alpha, scale=beta),
        )

    def test_halfstudentt_icdf(self):
        # nu=0.01 is excluded from the scipy-oracle sweep: scipy's own
        # t.ppf and t.cdf are mutually inconsistent there (t.cdf underflows
        # at t ~ 1e150 where the true two-tail survival is still 0.029 —
        # verified against the I_x(a,b) ~ x^a/(aB(a,b)) series). The
        # self-consistency test below covers that regime instead.
        safe_nu = Domain([0, 0.1, 0.9, 1, 2, 100, np.inf])
        check_icdf(
            pm.HalfStudentT,
            {"nu": safe_nu, "sigma": Rplus},
            lambda q, nu, sigma: st.t.ppf((q + 1) / 2, nu, scale=sigma),
        )

    def test_halfstudentt_icdf_selfconsistent_extreme_nu(self):
        """logcdf(icdf(q)) == log q out to quantiles where the tail sits at
        1e196 — the regime where scipy's cdf/ppf pair breaks down."""
        d = pm.HalfStudentT.dist(nu=0.01, sigma=0.01)
        qs = np.array([0.01, 0.25, 0.5, 0.9, 0.99])
        x = np.asarray(jax.device_get(pm.icdf(d, qs)))
        assert np.all(np.isfinite(x)) and np.all(x > 0)
        back = np.exp(np.asarray(jax.device_get(pm.logcdf(d, x))))
        np.testing.assert_allclose(back, qs, rtol=1e-6)

    def test_studentt_logcdf_extreme_tails(self):
        """Deep |t| tails at tiny nu: the betainc denormal-x floor used to
        return logcdf 0/-inf; the asymptotic branch must keep tracking."""
        d = pm.StudentT.dist(nu=0.01, mu=0.0, sigma=1.0)
        x = np.asarray(jax.device_get(pm.icdf(d, np.array([0.001, 0.999]))))
        assert np.isfinite(x).all()
        back = np.exp(np.asarray(jax.device_get(pm.logcdf(d, x))))
        np.testing.assert_allclose(back, [0.001, 0.999], rtol=1e-5)

    def test_halfnormal_icdf_extremes(self):
        d = pm.HalfNormal.dist(2.0)
        qs = np.array([1e-12, 1e-6, 1.0 - 1e-12])
        got = np.asarray(jax.device_get(pm.icdf(d, qs)))
        want = st.halfnorm.ppf(qs, scale=2.0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-10)


class TestLogCdfGaps:
    def test_triangular_logcdf(self):
        def ref(value, lower, c, upper):
            return st.triang.logcdf(
                value, (c - lower) / (upper - lower), lower, upper - lower
            )

        check_logcdf(
            pm.Triangular,
            Domain([-1.0, 0.0, 0.3, 1.5], edges=(None, None)),
            {"lower": Domain([-2.0], edges=(None, None)),
             "c": Domain([0.0, 0.5], edges=(None, None)),
             "upper": Domain([2.0], edges=(None, None))},
            ref,
        )

    def test_beta_mu_sigma_parametrization(self):
        # the mu/sigma parametrization is only valid on a safe domain
        # (reference test_beta_logp:390-402)
        def beta_mu_sigma(value, mu, sigma):
            kappa = mu * (1 - mu) / sigma**2 - 1
            return st.beta.logpdf(value, mu * kappa, (1 - mu) * kappa)

        safe_mu = Domain([0, 0.3, 0.5, 0.8, 1])  # edges excluded
        safe_sigma = Domain([0, 0.05, 0.1, np.inf])  # edges excluded by Domain
        check_logp(
            pm.Beta, Unit, {"mu": safe_mu, "sigma": safe_sigma},
            beta_mu_sigma, skip_paramdomain_outside_edge_test=True,
        )

    def test_lognormal_extreme_tail_logcdf(self):
        """Deep left tail: naive exp/log chains underflow; the erfc-based
        form must track scipy to 1e-6 relative down to logcdf ~ -5000."""
        d = pm.LogNormal.dist(mu=0.0, sigma=1.0)
        vals = np.array([1e-40, 1e-20, 1e-10, 1e-5])
        got = np.asarray(jax.device_get(pm.logcdf(d, vals)))
        want = st.lognorm.logcdf(vals, 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_normal_extreme_tail_logcdf(self):
        d = pm.Normal.dist(0.0, 1.0)
        vals = np.array([-40.0, -20.0, -10.0, 10.0, 20.0, 38.0])
        got = np.asarray(jax.device_get(pm.logcdf(d, vals)))
        want = st.norm.logcdf(vals)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)

    def test_gumbel_extreme_tail_logcdf(self):
        d = pm.Gumbel.dist(mu=0.0, beta=1.0)
        vals = np.array([-10.0, -5.0, 5.0, 30.0])
        got = np.asarray(jax.device_get(pm.logcdf(d, vals)))
        want = st.gumbel_r.logcdf(vals)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-15)

    def test_weibull_large_alpha_logp(self):
        """alpha=20 — the point where scipy's exponweib has precision
        issues (reference comment :760); compare against the explicit
        closed form instead."""
        alpha, beta = 20.0, 2.0
        d = pm.Weibull.dist(alpha, beta)
        for value in [0.5, 1.0, 1.9, 2.0, 2.1]:
            want = (
                np.log(alpha / beta)
                + (alpha - 1) * np.log(value / beta)
                - (value / beta) ** alpha
            )
            np.testing.assert_allclose(float(d.logp(value)), want, rtol=1e-10)
