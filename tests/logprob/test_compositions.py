"""Composability of derived-density combinators.

Reference discipline: tests/logprob/ builds composite measurable expressions
and checks derived logps against closed forms (e.g. censored mixtures,
truncated discrete RVs). Here the same compositions run through the
combinator layer.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import pymc_tpu as pm


class TestCensoredCompositions:
    def test_censored_truncated_normal(self):
        # Truncate to (0, inf) then censor at [0.5, 2]
        base = pm.Truncated.dist(pm.Normal.dist(1.0, 1.0), lower=0.0)
        d = pm.Censored.dist(base, lower=0.5, upper=2.0)
        tn = st.truncnorm(-1.0, np.inf, loc=1.0, scale=1.0)
        # interior density
        np.testing.assert_allclose(
            float(pm.logp(d, 1.3)), tn.logpdf(1.3), rtol=1e-6
        )
        # lower lump: P(X <= 0.5)
        np.testing.assert_allclose(
            float(pm.logp(d, 0.5)), np.log(tn.cdf(0.5)), rtol=1e-6
        )
        # upper lump: P(X >= 2)
        np.testing.assert_allclose(
            float(pm.logp(d, 2.0)), np.log(tn.sf(2.0)), rtol=1e-6
        )
        assert float(pm.logp(d, 2.5)) == -np.inf

    def test_censored_mixture(self):
        mix = pm.Mixture.dist(
            np.array([0.4, 0.6]),
            [pm.Normal.dist(-1.0, 1.0), pm.Normal.dist(2.0, 0.5)],
        )
        d = pm.Censored.dist(mix, lower=0.0)
        cdf0 = 0.4 * st.norm.cdf(0, -1, 1) + 0.6 * st.norm.cdf(0, 2, 0.5)
        np.testing.assert_allclose(
            float(pm.logp(d, 0.0)), np.log(cdf0), rtol=1e-6
        )
        pdf1 = 0.4 * st.norm.pdf(1, -1, 1) + 0.6 * st.norm.pdf(1, 2, 0.5)
        np.testing.assert_allclose(
            float(pm.logp(d, 1.0)), np.log(pdf1), rtol=1e-6
        )


class TestDiscretizedCompositions:
    def test_discretized_truncated(self):
        # floor of a positive-truncated normal: discrete support {0,1,...}
        base = pm.Truncated.dist(pm.Normal.dist(2.0, 1.5), lower=0.0)
        d = pm.Discretized.dist(base, method="floor")
        tn = st.truncnorm(-2.0 / 1.5, np.inf, loc=2.0, scale=1.5)
        k = np.arange(0, 10)
        expected = np.log(tn.cdf(k + 1) - tn.cdf(k))
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, k)), expected, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.exp(np.asarray(pm.logp(d, np.arange(0, 30)))).sum(), 1.0,
            rtol=1e-6,
        )

    def test_max_of_truncated(self):
        # extreme value of a bounded base
        base = pm.Truncated.dist(pm.Normal.dist(0.0, 1.0), lower=-1.0,
                                 upper=1.0)
        d = pm.Max.dist(base, n=4)
        tn = st.truncnorm(-1, 1)
        x = np.linspace(-0.9, 0.9, 7)
        expected = (
            np.log(4) + 3 * tn.logcdf(x) + tn.logpdf(x)
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), expected, rtol=1e-5
        )


class TestComparedCompositions:
    def test_compared_mixture_threshold(self):
        mix = pm.Mixture.dist(
            np.array([0.5, 0.5]),
            [pm.Normal.dist(-2.0, 1.0), pm.Normal.dist(2.0, 1.0)],
        )
        d = pm.Compared.dist(mix, 0.0, op=">")
        p_true = 0.5 * st.norm.sf(0, -2, 1) + 0.5 * st.norm.sf(0, 2, 1)
        np.testing.assert_allclose(
            float(np.exp(pm.logp(d, 1))), p_true, rtol=1e-6
        )

    def test_cumsum_of_exponentials_is_event_times(self):
        # cumsum of iid Exp(lam) = arrival times of a Poisson process;
        # joint density of (t1<t2<...<tn) = lam^n exp(-lam t_n)
        lam = 1.3
        d = pm.CumSum.dist(pm.Exponential.dist(lam, shape=(4,)))
        t = np.array([0.4, 1.1, 1.5, 2.8])
        lp = float(np.asarray(pm.logp(d, t)).sum())
        expected = 4 * np.log(lam) - lam * t[-1]
        np.testing.assert_allclose(lp, expected, rtol=1e-6)
        # unordered times have a negative increment -> -inf
        bad = np.array([0.4, 0.2, 1.5, 2.8])
        assert float(np.asarray(pm.logp(d, bad)).sum()) == -np.inf


class TestObservedCompositionsInModel:
    def test_censored_discretized_regression(self):
        # integer-recorded, right-censored measurements of a latent normal
        rng = np.random.default_rng(0)
        latent = rng.normal(3.0, 2.0, 400)
        y = np.minimum(np.round(latent), 6.0)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            sd = pm.HalfNormal("sd", 5)
            base = pm.Discretized.dist(pm.Normal.dist(mu, sd), method="round")
            pm.Censored("y", base, upper=6, observed=y.astype(int))
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        mu_hat = float(np.asarray(idata.posterior["mu"]).mean())
        sd_hat = float(np.asarray(idata.posterior["sd"]).mean())
        assert abs(mu_hat - 3.0) < 0.4
        assert abs(sd_hat - 2.0) < 0.4


def test_cumsum_rejects_size():
    import pytest

    with pytest.raises(ValueError, match="size"):
        pm.CumSum.dist(pm.Exponential.dist(1.0, shape=(10,)), size=(500,))
    # batched base is the supported spelling
    d = pm.CumSum.dist(pm.Exponential.dist(1.0, shape=(500, 10)))
    draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
    assert draws.shape == (500, 10)
    # rows are independent
    assert len(np.unique(np.round(draws[:, 0], 6))) > 400
