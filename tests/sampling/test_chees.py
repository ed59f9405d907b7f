"""ChEES-HMC sampler tests."""

import numpy as np
import pytest

import pymc_tpu as pm


class TestChees:
    def test_eight_schools_posterior(self):
        J = 8
        y = np.array([28., 8., -3., 7., -1., 1., 18., 12.])
        sigma = np.array([15., 10., 16., 11., 9., 11., 10., 18.])
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            tau = pm.HalfCauchy("tau", 5)
            tt = pm.Normal("tt", 0, 1, shape=(J,))
            pm.Normal("obs", mu + tau * tt, sigma, observed=y)
        idata = pm.sample(draws=800, tune=800, chains=8, model=m,
                          random_seed=42, progressbar=False,
                          compute_convergence_checks=False, sampler="chees",
                          mass_adapt="pooled")
        post = idata.posterior
        assert abs(post["mu"].values.mean() - 4.4) < 0.8
        assert abs(post["tau"].values.mean() - 3.6) < 0.9
        assert float(np.nanmax(pm.rhat(post["mu"].values))) < 1.02

    def test_trajectory_adapts(self):
        # correlated gaussian: optimal trajectory length > step size
        cov = np.array([[1.0, 0.95], [0.95, 1.0]])
        with pm.Model() as m:
            pm.MvNormal("x", mu=np.zeros(2), cov=cov)
        idata = pm.sample(draws=400, tune=600, chains=16, model=m,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False, sampler="chees")
        n_steps = idata.sample_stats["n_steps"].values
        # jittered lengths vary draw to draw, and exceed 1 on average
        assert n_steps.mean() > 2
        assert np.unique(n_steps).size > 3
        x = idata.posterior["x"].values
        np.testing.assert_allclose(
            np.cov(x.reshape(-1, 2).T), cov, atol=0.12
        )

    def test_full_mass_on_correlated_gaussian(self):
        # rho=0.98: a diag metric forces tiny steps along the ridge; the
        # pooled full covariance metric rescales it away. ChEES + full mass
        # must recover the target and mix clearly better than diag.
        rho = 0.98
        cov = np.array([[1.0, rho], [rho, 1.0]])

        def run(mass_matrix):
            with pm.Model() as m:
                pm.MvNormal("x", mu=np.zeros(2), cov=cov)
            return pm.sample(draws=500, tune=600, chains=16, model=m,
                             random_seed=7, progressbar=False,
                             compute_convergence_checks=False,
                             sampler="chees", mass_matrix=mass_matrix)

        idata_full = run("full")
        x = idata_full.posterior["x"].values
        np.testing.assert_allclose(np.cov(x.reshape(-1, 2).T), cov, atol=0.12)
        # the full metric whitens the ridge: same ESS from far fewer
        # gradient evaluations (shorter adapted trajectories)
        ess_full = float(np.nanmin(pm.ess(x)))
        evals_full = float(idata_full.sample_stats["n_steps"].values.sum())
        idata_diag = run("diag")
        ess_diag = float(np.nanmin(pm.ess(idata_diag.posterior["x"].values)))
        evals_diag = float(idata_diag.sample_stats["n_steps"].values.sum())
        eff_full = ess_full / evals_full
        eff_diag = ess_diag / evals_diag
        assert eff_full > 1.5 * eff_diag, (eff_full, eff_diag)

    def test_map_init(self):
        # init="map" (static Hessian-inverse full metric) now runs with ChEES
        y = np.random.default_rng(5).normal(1.0, 1.0, 40)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu, 1.0, observed=y)
        idata = pm.sample(draws=300, tune=300, chains=4, model=m,
                          random_seed=8, progressbar=False, init="map",
                          compute_convergence_checks=False, sampler="chees")
        n = len(y)
        np.testing.assert_allclose(
            idata.posterior["mu"].values.mean(),
            n * y.mean() / (n + 1 / 25), atol=0.1,
        )

    def test_matches_nuts(self):
        y = np.random.default_rng(0).normal(2.0, 1.5, 80)

        def build():
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 10)
                sd = pm.HalfNormal("sd", 5)
                pm.Normal("y", mu, sd, observed=y)
            return m

        a = pm.sample(draws=600, tune=600, chains=4, model=build(),
                      random_seed=2, progressbar=False, sampler="chees",
                      compute_convergence_checks=False)
        b = pm.sample(draws=600, tune=600, chains=4, model=build(),
                      random_seed=3, progressbar=False,
                      compute_convergence_checks=False)
        for var in ("mu", "sd"):
            np.testing.assert_allclose(
                a.posterior[var].values.mean(),
                b.posterior[var].values.mean(),
                atol=0.1,
            )
