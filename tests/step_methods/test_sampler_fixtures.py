"""Statistical sampler fixtures (reference tests/sampler_fixtures.py:27-180):
known-posterior KS tests + ESS and R-hat gates on real NUTS runs."""

import numpy as np
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.stats.convergence import ess, rhat


def _run(model, draws=1500, tune=1000, chains=4, seed=1, **kw):
    return pm.sample(draws=draws, tune=tune, chains=chains, model=model,
                     random_seed=seed, progressbar=False,
                     compute_convergence_checks=False, **kw)


def _gates(idata, name, min_ess=300.0, rhat_tol=0.05):
    x = idata.posterior[name].values
    assert float(np.nanmin(ess(x))) >= min_ess
    assert abs(float(np.nanmax(rhat(x))) - 1.0) < rhat_tol


class TestUniformKnownCDF:
    """x ~ Uniform(0, 1): pooled posterior draws must pass a KS test against
    the exact uniform CDF (reference KnownCDF/UniformFixture)."""

    def test_ks(self):
        with pm.Model() as m:
            pm.Uniform("x", 0.0, 1.0)
        idata = _run(m, draws=2000, chains=4)
        x = idata.posterior["x"].values.ravel()
        # thin to soften autocorrelation for the iid KS assumption
        stat, pval = st.kstest(x[::8], "uniform")
        assert pval > 0.001, (stat, pval)
        _gates(idata, "x")


class TestNormalKnownMoments:
    def test_mean_var(self):
        with pm.Model() as m:
            pm.Normal("x", mu=3.0, sigma=2.0, shape=(5,))
        idata = _run(m, draws=2000, chains=4)
        x = idata.posterior["x"].values
        np.testing.assert_allclose(x.mean(), 3.0, atol=0.15)
        np.testing.assert_allclose(x.std(), 2.0, atol=0.15)
        _gates(idata, "x")


class TestStudentTKnownMoments:
    def test_mean_var(self):
        with pm.Model() as m:
            pm.StudentT("x", nu=6.0, mu=0.0, sigma=1.0)
        idata = _run(m, draws=3000, chains=4)
        x = idata.posterior["x"].values
        np.testing.assert_allclose(x.mean(), 0.0, atol=0.12)
        # var = nu/(nu-2) = 1.5
        np.testing.assert_allclose(x.var(), 1.5, atol=0.35)
        _gates(idata, "x")


class TestBetaBinomialConjugate:
    """p ~ Beta(2,2), k ~ Binomial(10, p) observed k=7 -> posterior
    Beta(9, 5) exactly (reference BetaBinomialFixture role)."""

    def test_posterior_matches_conjugate(self):
        with pm.Model() as m:
            p = pm.Beta("p", 2.0, 2.0)
            pm.Binomial("k", n=10, p=p, observed=7)
        idata = _run(m, draws=3000, chains=4)
        draws = idata.posterior["p"].values.ravel()
        post = st.beta(9, 5)
        np.testing.assert_allclose(draws.mean(), post.mean(), atol=0.02)
        np.testing.assert_allclose(draws.std(), post.std(), atol=0.02)
        stat, pval = st.kstest(draws[::8], post.cdf)
        assert pval > 0.001, (stat, pval)
        _gates(idata, "p")


class TestLKJCholeskyCovPrior:
    """Prior sampling of LKJCholeskyCov via NUTS: correlation diag == 1,
    off-diagonals centered, sds follow the given prior scale (reference
    LKJCholeskyCovFixture role)."""

    def test_prior_shape_and_center(self):
        with pm.Model() as m:
            pm.LKJCholeskyCov(
                "chol_packed", n=3, eta=2.0,
                sd_dist=pm.Exponential.dist(1.0), compute_corr=False,
            )
        idata = _run(m, draws=1500, tune=1000, chains=4, seed=2)
        packed = idata.posterior["chol_packed"].values  # (c, s, 6)
        assert packed.shape[-1] == 6
        # unpack and check the implied correlations are in (-1, 1), centered
        L = np.zeros(packed.shape[:-1] + (3, 3))
        idx = np.tril_indices(3)
        L[..., idx[0], idx[1]] = packed
        cov = L @ np.swapaxes(L, -1, -2)
        sd = np.sqrt(np.diagonal(cov, axis1=-2, axis2=-1))
        corr = cov / (sd[..., :, None] * sd[..., None, :])
        off = corr[..., np.tril_indices(3, -1)[0], np.tril_indices(3, -1)[1]]
        assert np.all(np.abs(off) < 1.0)
        assert abs(off.mean()) < 0.1
        # sds ~ Exponential(1) prior: mean 1
        np.testing.assert_allclose(sd.mean(), 1.0, atol=0.2)
