"""Approximation-family contracts.

Mirrors /root/reference/tests/variational/test_approximations.py
(Empirical-from-trace:35, ELBO closed form:46, seeding:164) and
test_minibatch_rv.py (density scaling:33, missing total_size:115).
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.variational.approximations import Empirical


def _conjugate_model(n=100, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(1.0, 1.0, n)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0.0, 1.0)
        pm.Normal("y", mu, 1.0, observed=y)
    post_var = 1.0 / (1.0 + n)
    post_mean = y.sum() * post_var
    return m, y, post_mean, np.sqrt(post_var)


class TestEmpirical:
    def test_from_trace(self):
        # reference test_empirical_from_trace: the particle set IS the trace
        m, y, post_mean, post_sd = _conjugate_model()
        idata = pm.sample(draws=500, tune=300, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        with m:
            approx = Empirical(idata)
        assert approx.params["particles"].shape == (1000, 1)
        res = approx.sample(4000, random_seed=1)
        draws = res.posterior["mu"].values.ravel()
        np.testing.assert_allclose(draws.mean(), post_mean, atol=0.05)
        np.testing.assert_allclose(draws.std(), post_sd, atol=0.05)
        # resampling only returns values present in the trace
        traced = np.unique(np.round(idata.posterior["mu"].values.ravel(), 10))
        assert np.isin(np.round(draws, 10), traced).all()

    def test_size_subsamples(self):
        m, *_ = _conjugate_model()
        idata = pm.sample(draws=200, tune=200, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        with m:
            approx = Empirical(idata, size=57, random_seed=3)
        assert approx.params["particles"].shape == (57, 1)

    def test_no_density(self):
        m, *_ = _conjugate_model()
        idata = pm.sample(draws=50, tune=100, chains=1, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        with m:
            approx = Empirical(idata)
        with pytest.raises(NotImplementedError, match="no density"):
            approx.logq(approx.params, np.zeros((1, 1)))


class TestELBOClosedForm:
    def test_converged_elbo_is_log_evidence(self):
        # 1-D conjugate normal: mean-field q can match the exact posterior,
        # so the converged ELBO equals log p(y) (reference test_elbo checks
        # the pointwise ELBO formula; here the optimum is checked)
        m, y, *_ = _conjugate_model(n=40)
        n = len(y)
        cov = np.eye(n) + np.ones((n, n))
        log_evidence = st.multivariate_normal.logpdf(y, np.zeros(n), cov)
        approx = pm.fit(20000, model=m, random_seed=2, progressbar=False)
        elbo = -approx.hist[-2000:].mean()
        np.testing.assert_allclose(elbo, log_evidence, rtol=0.01)


class TestSeeding:
    def test_same_seed_same_params(self):
        m, *_ = _conjugate_model()
        a1 = pm.fit(500, model=m, random_seed=11, progressbar=False)
        a2 = pm.fit(500, model=m, random_seed=11, progressbar=False)
        np.testing.assert_array_equal(np.asarray(a1.params["mu"]),
                                      np.asarray(a2.params["mu"]))
        a3 = pm.fit(500, model=m, random_seed=12, progressbar=False)
        assert not np.array_equal(np.asarray(a1.params["mu"]),
                                  np.asarray(a3.params["mu"]))


class TestMinibatchDensityScaling:
    def test_logp_scaled_by_total_size(self):
        # reference test_minibatch_rv.py::test_density_scaling: logp of a
        # minibatched observed RV is scaled to the full dataset size
        data = np.ones(100)
        with pm.Model() as m1:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=data)
        with pm.Model() as m2:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=data[:10], total_size=100)
        lp1 = float(m1.compile_logp()({"mu": 0.5}))
        lp2 = float(m2.compile_logp()({"mu": 0.5}))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-6)

    def test_multidim_scaling(self):
        # scaling by the product of total_size dims
        data = np.ones((20, 4))
        with pm.Model() as m1:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=data)
        with pm.Model() as m2:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=data[:5], total_size=(20, 4))
        np.testing.assert_allclose(
            float(m1.compile_logp()({"mu": 0.3})),
            float(m2.compile_logp()({"mu": 0.3})), rtol=1e-6)
