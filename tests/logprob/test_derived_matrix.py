"""Derived-density matrix tests.

Broadens the logprob pyramid toward the reference's per-capability files
(tests/logprob/test_binary.py, test_order.py, test_cumsum.py,
test_censoring.py, test_mixture.py): every comparison operator on both
continuous and discrete bases, order statistics at arbitrary ranks and on
discrete supports, cumsum over chosen axes, censoring with broadcast
bounds, and nested mixtures — all against closed forms / scipy oracles.
"""

import numpy as np
import pytest
import scipy.stats as st
from scipy.special import comb

import jax
import pymc_tpu as pm


class TestComparedMatrix:
    """Reference logprob/binary.py:92-122 boundary semantics."""

    @pytest.mark.parametrize("op", [">", ">=", "<", "<="])
    def test_continuous_ops(self, op):
        c = 0.7
        d = pm.Compared.dist(pm.Normal.dist(0.5, 1.2), c, op=op)
        F = st.norm.cdf(c, 0.5, 1.2)
        S = 1.0 - F
        p_true = S if op in (">", ">=") else F
        np.testing.assert_allclose(float(np.exp(pm.logp(d, 1))), p_true,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(np.exp(pm.logp(d, 0))), 1 - p_true,
                                   rtol=1e-6)

    @pytest.mark.parametrize(
        "op,p_true_fn,p_false_fn",
        [
            (">", lambda d, c: d.sf(c), lambda d, c: d.cdf(c)),
            (">=", lambda d, c: d.sf(c) + d.pmf(c), lambda d, c: d.cdf(c - 1)),
            ("<", lambda d, c: d.cdf(c - 1), lambda d, c: d.sf(c) + d.pmf(c)),
            ("<=", lambda d, c: d.cdf(c), lambda d, c: d.sf(c)),
        ],
    )
    def test_discrete_boundary_corrections(self, op, p_true_fn, p_false_fn):
        lam, c = 3.5, 3
        base = pm.Poisson.dist(lam)
        d = pm.Compared.dist(base, c, op=op)
        oracle = st.poisson(lam)
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 1))), p_true_fn(oracle, c), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 0))), p_false_fn(oracle, c), rtol=1e-6
        )
        # total mass 1
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 0)) + np.exp(pm.logp(d, 1))), 1.0,
            rtol=1e-6,
        )

    def test_observed_threshold_recovers_location(self):
        # observing only exceedance indicators identifies mu (probit-style)
        rng = np.random.default_rng(0)
        latent = rng.normal(0.8, 1.0, 500)
        exceeded = (latent > 1.0).astype(int)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 3)
            pm.Compared("y", pm.Normal.dist(mu, 1.0), 1.0, op=">",
                        shape=(500,), observed=exceeded)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False)
        assert abs(float(idata.posterior["mu"].values.mean()) - 0.8) < 0.25


class TestOrderStatisticsMatrix:
    """Reference logprob/order.py, generalized ranks."""

    @pytest.mark.parametrize("n,k", [(5, 1), (5, 3), (5, 5), (9, 2)])
    def test_continuous_rank_closed_form(self, n, k):
        d = pm.OrderStatistic.dist(pm.Logistic.dist(0.3, 1.1), n=n, rank=k)
        x = np.linspace(-2, 2, 9)
        F = st.logistic.cdf(x, 0.3, 1.1)
        f = st.logistic.pdf(x, 0.3, 1.1)
        expected = (
            np.log(comb(n, k) * k)
            + (k - 1) * np.log(F) + (n - k) * np.log1p(-F) + np.log(f)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected,
                                   rtol=1e-5)

    def test_discrete_max(self):
        # P(max = k) = F(k)^n - F(k-1)^n (reference order.py:156-172)
        lam, n = 2.5, 6
        d = pm.Max.dist(pm.Poisson.dist(lam), n=n)
        oracle = st.poisson(lam)
        k = np.arange(0, 12)
        expected = oracle.cdf(k) ** n - oracle.cdf(k - 1) ** n
        np.testing.assert_allclose(
            np.exp(np.asarray(pm.logp(d, k))), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.exp(np.asarray(pm.logp(d, np.arange(0, 40)))).sum(), 1.0,
            rtol=1e-6,
        )

    def test_discrete_min(self):
        # P(min = k) = S(k-1)^n - S(k)^n
        p, n = 0.3, 4
        d = pm.Min.dist(pm.Geometric.dist(p), n=n)
        oracle = st.geom(p)
        k = np.arange(1, 15)
        expected = oracle.sf(k - 1) ** n - oracle.sf(k) ** n
        np.testing.assert_allclose(
            np.exp(np.asarray(pm.logp(d, k))), expected, rtol=1e-6
        )

    def test_sampling_matches_logp(self):
        # KS: forward draws of Max against the CDF implied by its logp
        d = pm.Max.dist(pm.Normal.dist(0.0, 1.0), n=7)
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
        ks = st.kstest(draws, lambda x: st.norm.cdf(x) ** 7)
        assert ks.pvalue > 0.01

    def test_median_of_uniform_is_beta(self):
        # k-th order stat of U(0,1) ~ Beta(k, n-k+1)
        n, k = 7, 4
        d = pm.OrderStatistic.dist(pm.Uniform.dist(0.0, 1.0), n=n, rank=k)
        x = np.linspace(0.05, 0.95, 10)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), st.beta.logpdf(x, k, n - k + 1),
            rtol=1e-5,
        )


class TestCumSumMatrix:
    def test_axis_selection(self):
        base = pm.Normal.dist(0.0, 1.0, shape=(3, 4))
        v = np.cumsum(np.arange(12.0).reshape(3, 4) / 10.0, axis=0)
        d0 = pm.CumSum.dist(pm.Normal.dist(0.0, 1.0, shape=(3, 4)), axis=0)
        diffs = np.diff(v, axis=0, prepend=0.0)
        expected = st.norm.logpdf(diffs).sum()
        np.testing.assert_allclose(
            float(np.asarray(pm.logp(d0, v)).sum()), expected, rtol=1e-6
        )

    def test_last_axis_default(self):
        v = np.array([[0.5, 0.9, 2.0], [0.1, 0.2, 0.25]])
        d = pm.CumSum.dist(pm.Exponential.dist(2.0, shape=(2, 3)))
        diffs = np.diff(v, axis=-1, prepend=0.0)
        expected = st.expon.logpdf(diffs, scale=0.5).sum()
        np.testing.assert_allclose(
            float(np.asarray(pm.logp(d, v)).sum()), expected, rtol=1e-6
        )

    def test_discrete_cumsum(self):
        # cumsum of Poisson counts: increments must be nonneg integers
        v = np.array([2.0, 3.0, 7.0])
        d = pm.CumSum.dist(pm.Poisson.dist(2.0, shape=(3,)))
        expected = st.poisson.logpmf([2, 1, 4], 2.0)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, v)), expected, rtol=1e-6
        )
        bad = np.array([2.0, 1.0, 7.0])  # decreasing -> impossible
        assert float(np.asarray(pm.logp(d, bad)).sum()) == -np.inf


class TestCensoredBroadcast:
    def test_broadcast_bounds(self):
        # per-observation censoring bounds (common survival-analysis shape)
        lower = np.array([-1.0, 0.0, -np.inf])
        upper = np.array([np.inf, 2.0, 1.0])
        d = pm.Censored.dist(pm.Normal.dist(0.0, 1.0, shape=(3,)),
                             lower=lower, upper=upper)
        v = np.array([-1.0, 2.0, 0.5])
        expected = np.array([
            st.norm.logcdf(-1.0),       # at lower lump
            np.log(st.norm.sf(2.0)),    # at upper lump
            st.norm.logpdf(0.5),        # interior
        ])
        np.testing.assert_allclose(np.asarray(pm.logp(d, v)), expected,
                                   rtol=1e-6)

    def test_interval_mass_sums_to_one(self):
        d = pm.Censored.dist(pm.Normal.dist(0.3, 1.0), lower=-1.0, upper=1.0)
        from scipy.integrate import quad

        interior, _ = quad(
            lambda x: np.exp(float(pm.logp(d, x))), -1 + 1e-9, 1 - 1e-9
        )
        lumps = float(np.exp(pm.logp(d, -1.0)) + np.exp(pm.logp(d, 1.0)))
        np.testing.assert_allclose(interior + lumps, 1.0, atol=1e-4)


class TestNestedMixtures:
    def test_mixture_of_mixtures_logp(self):
        inner = pm.Mixture.dist(
            np.array([0.3, 0.7]),
            [pm.Normal.dist(-3.0, 1.0), pm.Normal.dist(-1.0, 0.5)],
        )
        outer = pm.Mixture.dist(
            np.array([0.4, 0.6]), [inner, pm.Normal.dist(2.0, 1.0)]
        )
        x = np.linspace(-5, 4, 11)
        inner_pdf = 0.3 * st.norm.pdf(x, -3, 1) + 0.7 * st.norm.pdf(x, -1, 0.5)
        expected = np.log(0.4 * inner_pdf + 0.6 * st.norm.pdf(x, 2, 1))
        np.testing.assert_allclose(np.asarray(pm.logp(outer, x)), expected,
                                   rtol=1e-6)

    def test_mixture_of_censored(self):
        comps = [
            pm.Censored.dist(pm.Normal.dist(0.0, 1.0), lower=0.0),
            pm.Censored.dist(pm.Normal.dist(3.0, 1.0), lower=0.0),
        ]
        d = pm.Mixture.dist(np.array([0.5, 0.5]), comps)
        # lump at 0: mixture of the two censored masses
        expected0 = np.log(
            0.5 * st.norm.cdf(0, 0, 1) + 0.5 * st.norm.cdf(0, 3, 1)
        )
        np.testing.assert_allclose(float(pm.logp(d, 0.0)), expected0,
                                   rtol=1e-6)
        expected2 = np.log(
            0.5 * st.norm.pdf(2, 0, 1) + 0.5 * st.norm.pdf(2, 3, 1)
        )
        np.testing.assert_allclose(float(pm.logp(d, 2.0)), expected2,
                                   rtol=1e-6)
