"""Tests for derived-density combinators: Mixture, ZeroInflated/Hurdle,
Censored, Truncated, timeseries, CustomDist (mirrors reference
tests/distributions/test_mixture.py, test_censored.py, test_truncated.py,
test_timeseries.py, test_custom.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm


class TestMixture:
    def test_logp_list_components(self):
        w = np.array([0.3, 0.7])
        d = pm.Mixture.dist(
            w, [pm.Normal.dist(-2.0, 1.0), pm.Normal.dist(3.0, 0.5)]
        )
        x = np.linspace(-4, 5, 11)
        expected = np.log(
            0.3 * st.norm.pdf(x, -2, 1) + 0.7 * st.norm.pdf(x, 3, 0.5)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected, rtol=1e-7)

    def test_logp_single_batched_component(self):
        w = np.array([0.4, 0.6])
        d = pm.Mixture.dist(w, pm.Normal.dist(np.array([-1.0, 2.0]), 1.0))
        x = np.array([0.0, 1.0, -2.0])
        expected = np.log(
            0.4 * st.norm.pdf(x, -1, 1) + 0.6 * st.norm.pdf(x, 2, 1)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected, rtol=1e-7)

    def test_logcdf(self):
        w = np.array([0.5, 0.5])
        d = pm.Mixture.dist(w, [pm.Normal.dist(0.0, 1.0), pm.Normal.dist(2.0, 2.0)])
        x = np.array([-1.0, 0.5, 3.0])
        expected = np.log(
            0.5 * st.norm.cdf(x, 0, 1) + 0.5 * st.norm.cdf(x, 2, 2)
        )
        np.testing.assert_allclose(np.asarray(pm.logcdf(d, x)), expected, rtol=1e-6)

    def test_random_moments(self):
        w = np.array([0.3, 0.7])
        d = pm.Mixture.dist(
            w, [pm.Normal.dist(-2.0, 0.5), pm.Normal.dist(4.0, 1.0)],
            size=(40000,),
        )
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        np.testing.assert_allclose(draws.mean(), 0.3 * -2 + 0.7 * 4, atol=0.05)

    def test_in_model_sampling(self):
        rng = np.random.default_rng(1)
        y = np.concatenate([rng.normal(-2, 0.5, 150), rng.normal(3, 0.5, 350)])
        with pm.Model() as m:
            w = pm.Dirichlet("w", a=np.ones(2))
            mu = pm.Normal("mu", np.array([-1.0, 1.0]), 3.0, shape=(2,),
                           transform=pm.transforms.ordered
                           if hasattr(pm, "transforms") else None)
            comps = pm.Normal.dist(mu, 0.5)
            pm.Mixture("y", w, comps, observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m, random_seed=2,
                          progressbar=False, compute_convergence_checks=False)
        w_est = idata.posterior["w"].values.mean(axis=(0, 1))
        np.testing.assert_allclose(sorted(w_est), [0.3, 0.7], atol=0.07)

    def test_normal_mixture(self):
        d = pm.NormalMixture.dist(
            np.array([0.5, 0.5]), mu=np.array([0.0, 5.0]), sigma=1.0
        )
        x = np.array([2.5])
        expected = np.log(
            0.5 * st.norm.pdf(2.5, 0, 1) + 0.5 * st.norm.pdf(2.5, 5, 1)
        )
        np.testing.assert_allclose(float(pm.logp(d, x)[0]), expected, rtol=1e-7)


class TestZeroInflated:
    def test_zip_logp(self):
        psi, mu = 0.7, 3.0
        d = pm.ZeroInflatedPoisson.dist(psi, mu)
        ks = np.arange(0, 8)
        expected = np.where(
            ks == 0,
            np.log((1 - psi) + psi * st.poisson.pmf(0, mu)),
            np.log(psi * st.poisson.pmf(ks, mu)),
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, ks)), expected, rtol=1e-7)

    def test_zib_logp(self):
        psi, n, p = 0.6, 10, 0.4
        d = pm.ZeroInflatedBinomial.dist(psi, n, p)
        ks = np.arange(0, 10)
        expected = np.where(
            ks == 0,
            np.log((1 - psi) + psi * st.binom.pmf(0, n, p)),
            np.log(psi * st.binom.pmf(ks, n, p)),
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, ks)), expected, rtol=1e-7)

    def test_zinb_random(self):
        d = pm.ZeroInflatedNegativeBinomial.dist(0.5, mu=4.0, alpha=2.0,
                                                 size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        # mean = psi * mu
        np.testing.assert_allclose(draws.mean(), 0.5 * 4.0, atol=0.1)

    def test_hurdle_poisson_logp(self):
        psi, mu = 0.8, 2.0
        d = pm.HurdlePoisson.dist(psi, mu)
        trunc_norm = 1 - st.poisson.pmf(0, mu)
        ks = np.arange(0, 7)
        expected = np.where(
            ks == 0,
            np.log(1 - psi),
            np.log(psi * st.poisson.pmf(ks, mu) / trunc_norm),
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, ks)), expected, rtol=1e-6)

    def test_hurdle_gamma(self):
        psi, alpha, beta = 0.6, 2.0, 1.5
        d = pm.HurdleGamma.dist(psi, alpha=alpha, beta=beta)
        xs = np.array([0.0, 0.5, 2.0])
        expected = np.where(
            xs == 0,
            np.log(1 - psi),
            np.log(psi) + st.gamma.logpdf(xs, alpha, scale=1 / beta),
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, xs)), expected, rtol=1e-7)


class TestCensored:
    def test_continuous_logp(self):
        base = pm.Normal.dist(0.0, 2.0)
        d = pm.Censored.dist(base, lower=-1.0, upper=1.5)
        xs = np.array([-1.0, 0.0, 1.0, 1.5])
        expected = np.array([
            st.norm.logcdf(-1, 0, 2),
            st.norm.logpdf(0, 0, 2),
            st.norm.logpdf(1, 0, 2),
            st.norm.logsf(1.5, 0, 2),
        ])
        np.testing.assert_allclose(np.asarray(pm.logp(d, xs)), expected, rtol=1e-7)
        assert float(pm.logp(d, -1.1)) == -np.inf
        assert float(pm.logp(d, 1.6)) == -np.inf

    def test_discrete_logp(self):
        base = pm.Poisson.dist(3.0)
        d = pm.Censored.dist(base, lower=1, upper=5)
        expected_lo = st.poisson.logcdf(1, 3)
        expected_hi = np.log(1 - st.poisson.cdf(4, 3))
        np.testing.assert_allclose(float(pm.logp(d, 1)), expected_lo, rtol=1e-7)
        np.testing.assert_allclose(float(pm.logp(d, 5)), expected_hi, rtol=1e-7)
        np.testing.assert_allclose(
            float(pm.logp(d, 3)), st.poisson.logpmf(3, 3), rtol=1e-7
        )

    def test_sampling_clips(self):
        d = pm.Censored.dist(pm.Normal.dist(0.0, 1.0), lower=-0.5, upper=0.5,
                             size=(5000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(2)))
        assert draws.min() >= -0.5 and draws.max() <= 0.5
        assert (draws == -0.5).mean() > 0.2  # mass at bounds

    def test_censored_observed_model(self):
        rng = np.random.default_rng(3)
        latent = rng.normal(1.0, 1.0, 500)
        y = np.clip(latent, None, 1.5)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Censored("y", pm.Normal.dist(mu, 1.0), upper=1.5, observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m, random_seed=4,
                          progressbar=False, compute_convergence_checks=False)
        mu_est = idata.posterior["mu"].values.mean()
        assert abs(mu_est - 1.0) < 0.15, mu_est


class TestTruncated:
    def test_logp_normal(self):
        base = pm.Normal.dist(0.5, 1.0)
        d = pm.Truncated.dist(base, lower=-1.0, upper=2.0)
        xs = np.array([-0.5, 0.0, 1.5])
        expected = st.truncnorm.logpdf(xs, -1.5, 1.5, 0.5, 1.0)
        np.testing.assert_allclose(np.asarray(pm.logp(d, xs)), expected, rtol=1e-6)
        assert float(pm.logp(d, -1.5)) == -np.inf

    def test_logp_gamma(self):
        base = pm.Gamma.dist(2.0, 1.0)
        d = pm.Truncated.dist(base, lower=1.0)
        x = 2.5
        norm = st.gamma.sf(1.0, 2.0)
        expected = st.gamma.logpdf(x, 2.0) - np.log(norm)
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)

    def test_sampling_continuous(self):
        d = pm.Truncated.dist(pm.Normal.dist(0.0, 1.0), lower=1.0, size=(4000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(5)))
        assert draws.min() >= 1.0
        _, pval = st.kstest(draws, lambda x: st.truncnorm.cdf(x, 1.0, np.inf))
        assert pval > 0.01

    def test_sampling_discrete(self):
        d = pm.Truncated.dist(pm.Poisson.dist(3.0), lower=1, upper=6,
                              size=(8000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(6)))
        assert draws.min() >= 1 and draws.max() <= 6
        # frequencies match truncated pmf
        ks = np.arange(1, 7)
        pmf = st.poisson.pmf(ks, 3.0)
        pmf = pmf / pmf.sum()
        freq = np.array([(draws == k).mean() for k in ks])
        np.testing.assert_allclose(freq, pmf, atol=0.02)


class TestTimeseries:
    def test_grw_logp(self):
        d = pm.GaussianRandomWalk.dist(
            mu=0.2, sigma=0.5, init_dist=pm.Normal.dist(0.0, 1.0), steps=10
        )
        x = np.cumsum(np.random.default_rng(7).normal(0.2, 0.5, 11))
        expected = st.norm.logpdf(x[0], 0, 1) + st.norm.logpdf(
            np.diff(x), 0.2, 0.5
        ).sum()
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-7)

    def test_grw_random(self):
        d = pm.GaussianRandomWalk.dist(
            mu=1.0, sigma=0.1, init_dist=pm.Normal.dist(0.0, 0.1), steps=20,
            size=(2000,),
        )
        draws = np.asarray(d.sample(jax.random.PRNGKey(8)))
        assert draws.shape == (2000, 21)
        np.testing.assert_allclose(draws[:, -1].mean(), 20.0, atol=0.1)

    def test_ar_logp(self):
        rho = np.array([0.5, -0.3])
        d = pm.AR.dist(rho, sigma=0.2,
                       init_dist=pm.Normal.dist(0.0, 1.0, shape=(2,)),
                       steps=8)
        x = np.random.default_rng(9).normal(size=10)
        mean = rho[0] * x[1:-1] + rho[1] * x[:-2]
        expected = (
            st.norm.logpdf(x[:2], 0, 1).sum()
            + st.norm.logpdf(x[2:], mean, 0.2).sum()
        )
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)

    def test_ar_constant(self):
        rho = np.array([1.0, 0.5])  # constant + AR(1)
        d = pm.AR.dist(rho, sigma=0.3, constant=True,
                       init_dist=pm.Normal.dist(0.0, 1.0, shape=(1,)),
                       steps=5)
        x = np.random.default_rng(10).normal(size=6)
        mean = 1.0 + 0.5 * x[:-1]
        expected = (
            st.norm.logpdf(x[0], 0, 1)
            + st.norm.logpdf(x[1:], mean, 0.3).sum()
        )
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)

    def test_ar_stationary_sampling(self):
        d = pm.AR.dist(np.array([0.8]), sigma=1.0,
                       init_dist=pm.Normal.dist(0.0, 1.0 / np.sqrt(1 - 0.64),
                                                shape=(1,)),
                       steps=200, size=(500,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(11)))
        # stationary variance = sigma^2/(1-rho^2)
        np.testing.assert_allclose(
            draws[:, 100:].var(), 1 / (1 - 0.64), rtol=0.1
        )

    def test_garch11_logp(self):
        om, a1, b1, iv = 0.2, 0.3, 0.5, 1.0
        d = pm.GARCH11.dist(om, a1, b1, iv, steps=4)
        x = np.array([0.5, -1.0, 0.3, 0.8, -0.2])
        vols = [iv]
        for t in range(1, 5):
            vols.append(np.sqrt(om + a1 * x[t - 1] ** 2 + b1 * vols[-1] ** 2))
        expected = st.norm.logpdf(x, 0, vols).sum()
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)

    def test_euler_maruyama(self):
        # OU process dx = -theta x dt + s dW
        def sde(x, theta, s):
            return -theta * x, s

        d = pm.EulerMaruyama.dist(
            0.1, sde, (0.5, 0.3), init_dist=pm.Normal.dist(0.0, 1.0), steps=6
        )
        x = np.random.default_rng(12).normal(size=7)
        mu = x[:-1] - 0.5 * x[:-1] * 0.1
        expected = (
            st.norm.logpdf(x[0], 0, 1)
            + st.norm.logpdf(x[1:], mu, 0.3 * np.sqrt(0.1)).sum()
        )
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)

    def test_grw_in_model(self):
        rng = np.random.default_rng(13)
        path = np.cumsum(rng.normal(0.5, 1.0, 30))
        with pm.Model() as m:
            drift = pm.Normal("drift", 0, 2)
            sigma = pm.HalfNormal("sigma", 2)
            pm.GaussianRandomWalk(
                "y", mu=drift, sigma=sigma,
                init_dist=pm.Normal.dist(0.0, 10.0), steps=29, observed=path,
            )
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=14, progressbar=False,
                          compute_convergence_checks=False)
        d_est = idata.posterior["drift"].values.mean()
        assert abs(d_est - 0.5) < 0.6


class TestCustomDist:
    def test_logp_and_sampling(self):
        def logp(value, mu):
            return -jnp.abs(value - mu)  # laplace-ish up to constant

        def random(mu, rng=None, size=None):
            return mu + jax.random.laplace(rng, size)

        d = pm.CustomDist.dist(1.0, logp=logp, random=random)
        np.testing.assert_allclose(float(pm.logp(d, 3.0)), -2.0)
        draws = pm.CustomDist.dist(
            1.0, logp=logp, random=random, size=(1000,)
        ).sample(jax.random.PRNGKey(15))
        assert np.asarray(draws).shape == (1000,)

    def test_in_model(self):
        y = np.random.default_rng(16).normal(2.0, 1.0, 100)

        def logp(value, mu):
            return -0.5 * (value - mu) ** 2 - 0.5 * np.log(2 * np.pi)

        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.CustomDist("y", mu, logp=logp, observed=y)
        idata = pm.sample(draws=200, tune=200, chains=2, model=m,
                          random_seed=17, progressbar=False,
                          compute_convergence_checks=False)
        assert abs(idata.posterior["mu"].values.mean() - 2.0) < 0.3

    def test_requires_logp(self):
        with pytest.raises(TypeError, match="requires logp"):
            pm.CustomDist.dist(1.0, random=lambda mu, rng, size: mu)


class TestDiscretized:
    """Reference semantics: pymc/logprob/censoring.py:343-420 (round/floor/
    ceil/trunc of a continuous RV), scipy as oracle."""

    def _norm_cell(self, k, lo_off, hi_off, mu=0.3, sd=1.7):
        return np.log(
            st.norm.cdf(k + hi_off, mu, sd) - st.norm.cdf(k + lo_off, mu, sd)
        )

    def test_round_logp(self):
        d = pm.Discretized.dist(pm.Normal.dist(0.3, 1.7), method="round")
        k = np.arange(-6, 7)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, k)), self._norm_cell(k, -0.5, 0.5), rtol=1e-6
        )

    def test_floor_ceil_logp(self):
        base = pm.Normal.dist(0.3, 1.7)
        k = np.arange(-6, 7)
        np.testing.assert_allclose(
            np.asarray(pm.logp(pm.Discretized.dist(base, method="floor"), k)),
            self._norm_cell(k, 0.0, 1.0), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(pm.Discretized.dist(base, method="ceil"), k)),
            self._norm_cell(k, -1.0, 0.0), rtol=1e-6,
        )

    def test_trunc_logp_pooled_zero_cell(self):
        d = pm.Discretized.dist(pm.Normal.dist(0.3, 1.7), method="trunc")
        mu, sd = 0.3, 1.7
        # zero cell pools (-1, 1)
        np.testing.assert_allclose(
            float(pm.logp(d, 0)),
            np.log(st.norm.cdf(1, mu, sd) - st.norm.cdf(-1, mu, sd)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(pm.logp(d, 2)),
            np.log(st.norm.cdf(3, mu, sd) - st.norm.cdf(2, mu, sd)), rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(pm.logp(d, -2)),
            np.log(st.norm.cdf(-2, mu, sd) - st.norm.cdf(-3, mu, sd)),
            rtol=1e-6,
        )

    @pytest.mark.parametrize("method", ["round", "floor", "ceil", "trunc"])
    def test_pmf_sums_to_one(self, method):
        d = pm.Discretized.dist(pm.Normal.dist(0.0, 1.0), method=method)
        k = np.arange(-30, 31)
        total = np.exp(np.asarray(pm.logp(d, k))).sum()
        np.testing.assert_allclose(total, 1.0, rtol=1e-6)

    def test_logcdf(self):
        d = pm.Discretized.dist(pm.Normal.dist(0.3, 1.7), method="round")
        k = np.arange(-6, 7)
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(d, k)),
            st.norm.logcdf(k + 0.5, 0.3, 1.7), rtol=1e-6,
        )

    def test_sampling_matches_pmf(self):
        d = pm.Discretized.dist(pm.Exponential.dist(0.7), method="floor",
                                size=(100_000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        assert draws.dtype.kind == "i"
        # floor(Exp(lam)) is Geometric-like: P(k) = e^{-lam k}(1 - e^{-lam})
        for k in range(4):
            expected = np.exp(-0.7 * k) * (1 - np.exp(-0.7))
            np.testing.assert_allclose(
                (draws == k).mean(), expected, atol=0.01
            )

    def test_rejects_discrete_base(self):
        with pytest.raises(ValueError, match="continuous"):
            pm.Discretized.dist(pm.Poisson.dist(3.0))

    def test_observed_in_model(self):
        rng = np.random.default_rng(0)
        y = np.round(rng.normal(2.0, 1.0, 200))
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 10.0)
            pm.Discretized("y", pm.Normal.dist(mu, 1.0), observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, random_seed=0,
                          model=m, progressbar=False,
                          compute_convergence_checks=False)
        post = np.asarray(idata.posterior["mu"]).mean()
        assert abs(post - y.mean()) < 0.2


class TestOrderStatistic:
    """Reference: pymc/logprob/order.py:142-172 (max/min of iid RVs)."""

    def test_max_continuous(self):
        n = 5
        d = pm.Max.dist(pm.Normal.dist(0.5, 2.0), n=n)
        x = np.linspace(-3, 6, 13)
        expected = (
            np.log(n)
            + (n - 1) * st.norm.logcdf(x, 0.5, 2.0)
            + st.norm.logpdf(x, 0.5, 2.0)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(d, x)), n * st.norm.logcdf(x, 0.5, 2.0),
            rtol=1e-6,
        )

    def test_min_continuous(self):
        n = 7
        d = pm.Min.dist(pm.Exponential.dist(1.3), n=n)
        # min of n iid Exp(lam) is Exp(n*lam)
        x = np.linspace(0.01, 3, 9)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), st.expon.logpdf(x, scale=1 / (7 * 1.3)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(d, x)),
            st.expon.logcdf(x, scale=1 / (7 * 1.3)), rtol=1e-5,
        )

    def test_interior_rank_integrates_to_one(self):
        from scipy import integrate

        d = pm.OrderStatistic.dist(pm.Normal.dist(0.0, 1.0), n=6, rank=3)
        total, _ = integrate.quad(
            lambda x: float(np.exp(pm.logp(d, x))), -10, 10
        )
        np.testing.assert_allclose(total, 1.0, rtol=1e-6)

    def test_max_discrete(self):
        n = 4
        d = pm.Max.dist(pm.Poisson.dist(3.0), n=n)
        k = np.arange(0, 15)
        F = st.poisson.cdf(k, 3.0)
        F_prev = st.poisson.cdf(k - 1, 3.0)
        expected = np.log(F**n - F_prev**n)
        np.testing.assert_allclose(np.asarray(pm.logp(d, k)), expected,
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.exp(np.asarray(pm.logp(d, np.arange(0, 60)))).sum(), 1.0,
            rtol=1e-6,
        )

    def test_min_discrete(self):
        n = 3
        d = pm.Min.dist(pm.Geometric.dist(0.3), n=n)
        # min of n iid Geometric(p) (support 1,2,...) is Geometric(1-(1-p)^n)
        p_min = 1 - (1 - 0.3) ** n
        k = np.arange(1, 12)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, k)), st.geom.logpmf(k, p_min), rtol=1e-5
        )

    def test_sampling(self):
        d = pm.Max.dist(pm.Uniform.dist(0.0, 1.0), n=9, size=(50_000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        # E[max of 9 U(0,1)] = 9/10
        np.testing.assert_allclose(draws.mean(), 0.9, atol=0.005)

    def test_discrete_interior_rank_rejected(self):
        with pytest.raises(NotImplementedError):
            pm.OrderStatistic.dist(pm.Poisson.dist(1.0), n=5, rank=2)

    def test_observed_in_model(self):
        # extreme-value inference: observe only the max of n iid normals
        rng = np.random.default_rng(2)
        y = rng.normal(1.0, 1.0, (300, 10)).max(axis=1)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 5.0)
            pm.Max("y", pm.Normal.dist(mu, 1.0), n=10, shape=(300,),
                   observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, random_seed=0,
                          model=m, progressbar=False,
                          compute_convergence_checks=False)
        post = np.asarray(idata.posterior["mu"]).mean()
        assert abs(post - 1.0) < 0.25


class TestCumSum:
    """Reference: pymc/logprob/cumsum.py:53-75."""

    def test_logp_matches_diff(self):
        d = pm.CumSum.dist(pm.Normal.dist(1.0, 0.5, shape=(6,)))
        v = np.array([1.0, 2.5, 3.0, 4.8, 5.0, 7.2])
        diffs = np.concatenate([[v[0]], np.diff(v)])
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, v)), st.norm.logpdf(diffs, 1.0, 0.5),
            rtol=1e-6,
        )

    def test_equals_gaussian_random_walk(self):
        # cumsum of iid normals == GRW with zero init (up to init handling)
        d = pm.CumSum.dist(pm.Normal.dist(0.0, 1.0, shape=(5,)))
        v = np.array([0.3, 0.1, -0.5, 0.2, 1.0])
        lp = float(np.asarray(pm.logp(d, v)).sum())
        diffs = np.concatenate([[v[0]], np.diff(v)])
        np.testing.assert_allclose(lp, st.norm.logpdf(diffs).sum(), rtol=1e-6)

    def test_axis(self):
        d = pm.CumSum.dist(pm.Normal.dist(0.0, 1.0, shape=(3, 4)), axis=0)
        v = np.arange(12, dtype=float).reshape(3, 4)
        first = v[:1]
        diffs = np.concatenate([first, np.diff(v, axis=0)], axis=0)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, v)), st.norm.logpdf(diffs), rtol=1e-6
        )

    def test_sampling(self):
        d = pm.CumSum.dist(pm.Normal.dist(0.0, 1.0, shape=(4,)))
        draws = np.asarray(
            d.sample(jax.random.PRNGKey(0), sample_shape=(20_000,))
        )
        np.testing.assert_allclose(
            draws.var(axis=0), [1.0, 2.0, 3.0, 4.0], rtol=0.05
        )


class TestCompared:
    """Reference: pymc/logprob/binary.py:92-122."""

    def test_continuous_gt(self):
        d = pm.Compared.dist(pm.Normal.dist(1.0, 2.0), 0.5, op=">")
        np.testing.assert_allclose(
            float(pm.logp(d, 1)), st.norm.logsf(0.5, 1.0, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(d, 0)), st.norm.logcdf(0.5, 1.0, 2.0), rtol=1e-6
        )
        assert float(pm.logp(d, 2)) == -np.inf

    @pytest.mark.parametrize("op,true_p", [
        (">",  lambda c: st.poisson.sf(c, 3.0)),
        (">=", lambda c: st.poisson.sf(c - 1, 3.0)),
        ("<",  lambda c: st.poisson.cdf(c - 1, 3.0)),
        ("<=", lambda c: st.poisson.cdf(c, 3.0)),
    ])
    def test_discrete_boundaries(self, op, true_p):
        c = 2
        d = pm.Compared.dist(pm.Poisson.dist(3.0), c, op=op)
        p = true_p(c)
        np.testing.assert_allclose(float(np.exp(pm.logp(d, 1))), p, rtol=1e-6)
        np.testing.assert_allclose(float(np.exp(pm.logp(d, 0))), 1 - p,
                                   rtol=1e-6)

    def test_sampling(self):
        d = pm.Compared.dist(pm.Normal.dist(0.0, 1.0), 1.0, op="<",
                             size=(50_000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        np.testing.assert_allclose(draws.mean(), st.norm.cdf(1.0), atol=0.01)

    def test_observed_in_model(self):
        # probit-style: observe threshold crossings of a latent normal
        rng = np.random.default_rng(3)
        latent = rng.normal(0.7, 1.0, 400)
        y = (latent > 0.0).astype(int)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 5.0)
            pm.Compared("y", pm.Normal.dist(mu, 1.0), 0.0, op=">",
                        shape=(400,), observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, random_seed=0,
                          model=m, progressbar=False,
                          compute_convergence_checks=False)
        post = np.asarray(idata.posterior["mu"]).mean()
        assert abs(post - 0.7) < 0.25


class TestMvRandomWalks:
    """MvGaussianRandomWalk / MvStudentTRandomWalk logp against the exact
    increment decomposition (reference timeseries.py:301,345): logp(x) =
    init.logp(x0) + sum_t innovation.logp(x_t - x_{t-1})."""

    def _oracle(self, x, init_logpdf, innov_logpdf):
        lp = init_logpdf(x[0])
        for t in range(1, x.shape[0]):
            lp += innov_logpdf(x[t] - x[t - 1])
        return lp

    def test_mv_gaussian_rw_logp(self):
        import scipy.stats as st

        rng = np.random.default_rng(0)
        D, T = 3, 6
        mu = np.array([0.1, -0.2, 0.3])
        A = rng.normal(size=(D, D))
        cov = A @ A.T + D * np.eye(D)
        init = pm.MvNormal.dist(mu=np.zeros(D), cov=np.eye(D))
        d = pm.MvGaussianRandomWalk.dist(mu=mu, cov=cov, steps=T,
                                         init_dist=init)
        x = np.cumsum(rng.normal(size=(T + 1, D)), axis=0)
        got = float(np.asarray(d.logp(jnp.asarray(x))))
        expected = self._oracle(
            x,
            st.multivariate_normal(np.zeros(D), np.eye(D)).logpdf,
            st.multivariate_normal(mu, cov).logpdf,
        )
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_mv_studentt_rw_logp(self):
        import scipy.stats as st

        rng = np.random.default_rng(1)
        D, T, nu = 2, 5, 7.0
        mu = np.array([0.5, -0.5])
        scale = np.array([[2.0, 0.3], [0.3, 1.0]])
        init = pm.MvNormal.dist(mu=np.zeros(D), cov=np.eye(D))
        d = pm.MvStudentTRandomWalk.dist(nu, mu=mu, scale=scale, steps=T,
                                         init_dist=init)
        x = np.cumsum(rng.normal(size=(T + 1, D)), axis=0)
        got = float(np.asarray(d.logp(jnp.asarray(x))))
        expected = self._oracle(
            x,
            st.multivariate_normal(np.zeros(D), np.eye(D)).logpdf,
            st.multivariate_t(mu, scale, df=nu).logpdf,
        )
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_sampling_shape_and_drift(self):
        D, T = 3, 50
        mu = np.array([1.0, 0.0, -1.0])
        d = pm.MvGaussianRandomWalk.dist(
            mu=mu, cov=0.01 * np.eye(D), steps=T,
            init_dist=pm.MvNormal.dist(mu=np.zeros(D), cov=1e-4 * np.eye(D)),
        )
        draws = np.asarray(d.sample(jax.random.PRNGKey(0),
                                    sample_shape=(200,)))
        assert draws.shape == (200, T + 1, D)
        # terminal mean ~ T * mu
        np.testing.assert_allclose(draws[:, -1].mean(axis=0), T * mu,
                                   rtol=0.1, atol=0.5)


class TestTruncatedExtended:
    """Reference tests/distributions/test_truncated.py extras: discrete
    logp/logcdf, one-sided truncation, icdf, TruncatedNormal equivalence,
    moments inside the bounds."""

    def test_discrete_logp_and_logcdf(self):
        d = pm.Truncated.dist(pm.Poisson.dist(3.0), lower=1, upper=6)
        ks = np.arange(1, 7)
        pmf = st.poisson.pmf(ks, 3.0)
        pmf = pmf / pmf.sum()
        got = np.exp(np.asarray(pm.logp(d, ks)))
        np.testing.assert_allclose(got, pmf, rtol=1e-6)
        assert float(pm.logp(d, 0)) == -np.inf
        assert float(pm.logp(d, 7)) == -np.inf
        cdf = np.exp(np.asarray(d.logcdf(jnp.asarray(ks))))
        np.testing.assert_allclose(cdf, np.cumsum(pmf), rtol=1e-6)

    def test_upper_only(self):
        d = pm.Truncated.dist(pm.Normal.dist(0.0, 1.0), upper=0.0)
        x = -0.7
        expected = st.truncnorm.logpdf(x, -np.inf, 0.0)
        np.testing.assert_allclose(float(pm.logp(d, x)), expected, rtol=1e-6)
        draws = np.asarray(
            pm.Truncated.dist(pm.Normal.dist(0.0, 1.0), upper=0.0,
                              size=(2000,)).sample(jax.random.PRNGKey(0))
        )
        assert draws.max() <= 0.0

    def test_icdf_matches_scipy(self):
        d = pm.Truncated.dist(pm.Normal.dist(0.5, 2.0), lower=-1.0, upper=3.0)
        qs = np.array([0.05, 0.3, 0.5, 0.9])
        a, b = (-1.0 - 0.5) / 2.0, (3.0 - 0.5) / 2.0
        expected = st.truncnorm.ppf(qs, a, b, 0.5, 2.0)
        got = np.asarray(d.icdf(jnp.asarray(qs)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_truncated_normal_equivalence(self):
        # TruncatedNormal(mu, sigma, lower, upper) must equal
        # Truncated(Normal(mu, sigma), lower, upper) exactly
        tn = pm.TruncatedNormal.dist(0.5, 1.5, lower=-1.0, upper=2.0)
        tr = pm.Truncated.dist(pm.Normal.dist(0.5, 1.5), lower=-1.0,
                               upper=2.0)
        xs = jnp.asarray([-0.9, 0.0, 1.0, 1.9])
        np.testing.assert_allclose(np.asarray(pm.logp(tn, xs)),
                                   np.asarray(pm.logp(tr, xs)), rtol=1e-6)

    def test_support_point_inside_bounds(self):
        # base support point (mean 5.0) falls outside [0, 1]: the truncated
        # support point must still be inside
        d = pm.Truncated.dist(pm.Normal.dist(5.0, 1.0), lower=0.0, upper=1.0)
        sp = float(np.asarray(d.support_point()))
        assert 0.0 <= sp <= 1.0
        assert np.isfinite(float(np.asarray(d.logp(jnp.asarray(sp)))))

    def test_in_model_posterior(self):
        rng = np.random.default_rng(3)
        raw = rng.normal(1.0, 1.0, 600)
        y = raw[(raw > 0.0) & (raw < 3.0)]
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Truncated("y", pm.Normal.dist(mu, 1.0), lower=0.0, upper=3.0,
                         observed=y)
        idata = pm.sample(draws=500, tune=500, chains=2, model=m,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False)
        assert abs(float(idata.posterior["mu"].values.mean()) - 1.0) < 0.25


class TestCensoredExtended:
    """Reference tests/distributions/test_censored.py extras."""

    def test_one_sided(self):
        # right-censoring only: point mass at upper, density below
        d = pm.Censored.dist(pm.Normal.dist(0.0, 1.0), lower=None, upper=1.0)
        np.testing.assert_allclose(
            float(pm.logp(d, 1.0)), st.norm.logsf(1.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(d, 0.3)), st.norm.logpdf(0.3), rtol=1e-6
        )
        # above the bound: impossible
        assert float(pm.logp(d, 1.5)) == -np.inf

    def test_support_point_clipped(self):
        d = pm.Censored.dist(pm.Normal.dist(5.0, 1.0), lower=-1.0, upper=1.0)
        sp = float(np.asarray(d.support_point()))
        assert -1.0 <= sp <= 1.0

    def test_censored_discrete_poisson(self):
        # censored Poisson: P(x=upper) collects the upper tail
        d = pm.Censored.dist(pm.Poisson.dist(3.0), lower=None, upper=4)
        expected_at_4 = st.poisson.sf(3, 3.0)  # P(X >= 4)
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 4))), expected_at_4, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 2))), st.poisson.pmf(2, 3.0), rtol=1e-6
        )

    def test_sampling_statistics(self):
        d = pm.Censored.dist(pm.Normal.dist(0.0, 1.0), lower=-0.5, upper=0.5,
                             size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(2)))
        # boundary point masses match the tail probabilities
        np.testing.assert_allclose((draws == -0.5).mean(),
                                   st.norm.cdf(-0.5), atol=0.01)
        np.testing.assert_allclose((draws == 0.5).mean(),
                                   st.norm.sf(0.5), atol=0.01)
        assert draws.min() >= -0.5 and draws.max() <= 0.5


class TestMixtureExtended:
    """Reference tests/distributions/test_mixture.py extras: heterogeneous
    families, batched weights, component-proportion sampling, moments."""

    def test_heterogeneous_components(self):
        # Normal + Gamma mixture over the shared positive half-line region
        w = np.array([0.3, 0.7])
        d = pm.Mixture.dist(w=w, comp_dists=[pm.Normal.dist(2.0, 0.5),
                                             pm.Gamma.dist(3.0, 1.0)])
        xs = np.array([0.5, 1.5, 3.0])
        expected = np.log(
            0.3 * st.norm.pdf(xs, 2.0, 0.5) + 0.7 * st.gamma.pdf(xs, 3.0)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, xs)), expected,
                                   rtol=1e-6)

    def test_batched_weights(self):
        # per-observation weights (n, 2): each row mixes differently
        w = np.array([[0.9, 0.1], [0.1, 0.9]])
        d = pm.Mixture.dist(w=w, comp_dists=[pm.Normal.dist(-2.0, 1.0),
                                             pm.Normal.dist(2.0, 1.0)])
        xs = np.array([-2.0, 2.0])
        expected = np.log(
            w[:, 0] * st.norm.pdf(xs, -2.0, 1.0)
            + w[:, 1] * st.norm.pdf(xs, 2.0, 1.0)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, xs)), expected,
                                   rtol=1e-6)

    def test_sampling_proportions(self):
        w = np.array([0.25, 0.75])
        d = pm.Mixture.dist(w=w, comp_dists=[pm.Normal.dist(-10.0, 0.5),
                                             pm.Normal.dist(10.0, 0.5)],
                            size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(3)))
        np.testing.assert_allclose((draws < 0).mean(), 0.25, atol=0.01)

    def test_normal_mixture_moments(self):
        w = np.array([0.4, 0.6])
        mu = np.array([-1.0, 2.0])
        sigma = np.array([0.5, 1.0])
        d = pm.NormalMixture.dist(w=w, mu=mu, sigma=sigma, size=(40000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(4)))
        mean = (w * mu).sum()
        var = (w * (sigma**2 + mu**2)).sum() - mean**2
        np.testing.assert_allclose(draws.mean(), mean, atol=0.03)
        np.testing.assert_allclose(draws.var(), var, rtol=0.03)

    def test_mixture_logcdf(self):
        w = np.array([0.3, 0.7])
        d = pm.Mixture.dist(w=w, comp_dists=[pm.Normal.dist(-1.0, 1.0),
                                             pm.Normal.dist(1.0, 1.0)])
        xs = np.array([-2.0, 0.0, 2.0])
        expected = np.log(0.3 * st.norm.cdf(xs, -1.0, 1.0)
                          + 0.7 * st.norm.cdf(xs, 1.0, 1.0))
        np.testing.assert_allclose(np.asarray(d.logcdf(jnp.asarray(xs))),
                                   expected, rtol=1e-6)


class TestZeroInflatedHurdleSampling:
    """Sampling statistics for the zero-inflated/hurdle families (reference
    test_mixture.py Zero-Inflated/Hurdle random coverage)."""

    def test_zip_zero_fraction(self):
        psi, mu = 0.6, 3.0
        d = pm.ZeroInflatedPoisson.dist(psi=psi, mu=mu, size=(30000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        expected_zero = (1 - psi) + psi * st.poisson.pmf(0, mu)
        np.testing.assert_allclose((draws == 0).mean(), expected_zero,
                                   atol=0.01)
        # nonzero draws are Poisson draws conditioned on > 0:
        # mean = mu / (1 - e^-mu)
        nz = draws[draws > 0]
        np.testing.assert_allclose(nz.mean(), mu / (1 - np.exp(-mu)),
                                   rtol=0.02)

    def test_hurdle_poisson_no_extra_zeros(self):
        psi, mu = 0.7, 2.0
        d = pm.HurdlePoisson.dist(psi=psi, mu=mu, size=(30000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        np.testing.assert_allclose((draws == 0).mean(), 1 - psi, atol=0.01)
        # nonzero part is zero-truncated Poisson: mean mu/(1-exp(-mu))
        nz = draws[draws > 0]
        np.testing.assert_allclose(nz.mean(), mu / (1 - np.exp(-mu)),
                                   rtol=0.02)

    def test_hurdle_gamma_sampling_independent(self):
        # continuous hurdle: nonzero part matches the Gamma base moments
        # (regression: base was drawn once and broadcast, perfectly
        # correlating the batch)
        d = pm.HurdleGamma.dist(psi=0.6, alpha=3.0, beta=1.0, size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(5)))
        np.testing.assert_allclose((draws == 0).mean(), 0.4, atol=0.01)
        nz = draws[draws > 0]
        assert nz.std() > 0.5  # would be 0 under the broadcast bug
        np.testing.assert_allclose(nz.mean(), 3.0, rtol=0.03)


class TestTimeseriesBatchIndependence:
    """Regression: init draws must be sampled at the full batch shape —
    subtracting the init dist's ndim from the BATCH axes left every batch
    element sharing one init (and AR with a scalar init crashed)."""

    @pytest.mark.parametrize("name,make", [
        ("AR scalar-init", lambda: pm.AR.dist(
            rho=[0.5], sigma=1.0, steps=5,
            init_dist=pm.Normal.dist(0, 1), size=(300,))),
        ("AR(2) vec-init", lambda: pm.AR.dist(
            rho=[0.5, -0.2], sigma=1.0, steps=5,
            init_dist=pm.Normal.dist(0, 1, shape=(2,)), size=(300,))),
        ("MvGRW", lambda: pm.MvGaussianRandomWalk.dist(
            mu=np.zeros(2), cov=np.eye(2), steps=5,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2)),
            size=(300,))),
        ("MvStudentTRW", lambda: pm.MvStudentTRandomWalk.dist(
            5.0, mu=np.zeros(2), scale=np.eye(2), steps=5,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2)),
            size=(300,))),
    ], ids=["ar-scalar", "ar2-vec", "mvgrw", "mvstrw"])
    def test_independent_inits(self, name, make):
        d = make()
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        assert draws.shape[0] == 300
        first = draws.reshape(300, -1)[:, 0]
        assert len(np.unique(np.round(first, 6))) > 250, name
