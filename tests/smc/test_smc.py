"""SMC tests (mirrors reference tests/smc/test_smc.py: posterior accuracy and
marginal-likelihood correctness)."""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm


@pytest.fixture(scope="module")
def conjugate_result():
    rng = np.random.default_rng(0)
    y = rng.normal(1.0, 1.0, 30)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 1)
        pm.Normal("y", mu, 1, observed=y)
    idata = pm.sample_smc(draws=1500, chains=2, model=m, random_seed=1,
                          progressbar=False, compute_convergence_checks=False)
    return y, idata


class TestSMC:
    def test_posterior_accuracy(self, conjugate_result):
        y, idata = conjugate_result
        n = len(y)
        post = idata.posterior["mu"].values
        np.testing.assert_allclose(post.mean(), n * y.mean() / (n + 1), atol=0.05)
        np.testing.assert_allclose(post.std(), np.sqrt(1 / (n + 1)), atol=0.03)

    def test_marginal_likelihood(self, conjugate_result):
        y, idata = conjugate_result
        n = len(y)
        cov = np.eye(n) + np.ones((n, n))
        exact = st.multivariate_normal.logpdf(y, np.zeros(n), cov)
        lml = np.asarray(idata.posterior.attrs["log_marginal_likelihood"])
        np.testing.assert_allclose(lml, exact, atol=0.5)

    def test_mh_kernel(self):
        rng = np.random.default_rng(2)
        y = rng.normal(0.5, 1.0, 20)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=y)
        idata = pm.sample_smc(draws=1000, chains=2, kernel="mh", model=m,
                              random_seed=3, progressbar=False,
                              compute_convergence_checks=False)
        n = len(y)
        np.testing.assert_allclose(
            idata.posterior["mu"].values.mean(), n * y.mean() / (n + 1),
            atol=0.07,
        )

    def test_beta_reaches_one(self, conjugate_result):
        _, idata = conjugate_result
        assert np.all(idata.sample_stats["beta"].values >= 1.0)

    def test_multimodal_mixture(self):
        # SMC's signature capability: multimodal targets via tempering
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1, shape=(2,))
            pm.Potential(
                "bimodal",
                pm.math.logsumexp(
                    -0.5 * ((x[0:1] - np.array([-3.0, 3.0])) / 0.5) ** 2
                ),
            )
        idata = pm.sample_smc(draws=2000, chains=2, model=m, random_seed=4,
                              progressbar=False,
                              compute_convergence_checks=False)
        draws = idata.posterior["x"].values[..., 0].ravel()
        # both modes populated
        assert (draws < -1).mean() > 0.15
        assert (draws > 1).mean() > 0.15
