"""InferenceData conversion depth battery.

Ports the reference tests/backends/test_arviz.py case inventory that applies
to this framework's native converter: coords/dims autodetection into
posterior AND observed_data/constant_data, multiple observed RVs with
per-variable log_likelihood, missing-data models, multivariate observations,
warmup group handling, posterior-predictive shape preservation, and
single-chain/subset conversions.
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning


@pytest.fixture(scope="module")
def school_model_idata():
    J = 8
    y = np.array([28.0, 8, -3, 7, -1, 1, 18, 12])
    sigma = np.array([15.0, 10, 16, 11, 9, 11, 10, 18])
    with pm.Model(coords={"school": [f"s{i}" for i in range(J)]}) as model:
        mu = pm.Normal("mu", 0, 5)
        tau = pm.HalfCauchy("tau", 5)
        theta = pm.Normal("theta", mu, tau, dims="school")
        pm.Normal("obs", theta, sigma, observed=y, dims="school")
        idata = pm.sample(
            draws=60, tune=60, chains=2, progressbar=False,
            compute_convergence_checks=False, random_seed=11,
        )
    return model, idata


class TestGroupsAndCoords:
    def test_autodetect_coords_from_model(self, school_model_idata):
        model, idata = school_model_idata
        assert idata.posterior["theta"].dims == ("chain", "draw", "school")
        assert list(np.asarray(idata.posterior.coords["school"])[:2]) == ["s0", "s1"]
        assert "obs" in idata.observed_data
        assert idata.observed_data["obs"].dims == ("school",)

    def test_log_likelihood_group(self, school_model_idata):
        model, idata = school_model_idata
        ll = pm.compute_log_likelihood(idata, model=model)
        assert "log_likelihood" in ll.groups()
        assert ll.log_likelihood["obs"].values.shape == (2, 60, 8)
        # spot-check one entry against the density
        import scipy.stats as st

        theta = ll.posterior["theta"].values[0, 0]
        obs = np.array([28.0, 8, -3, 7, -1, 1, 18, 12])
        sig = np.array([15.0, 10, 16, 11, 9, 11, 10, 18])
        np.testing.assert_allclose(
            ll.log_likelihood["obs"].values[0, 0],
            st.norm.logpdf(obs, theta, sig),
            rtol=1e-6,
        )

    def test_multiple_observed_rvs_log_likelihood(self):
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y1", mu, 1, observed=np.array([0.1, 0.2]))
            pm.Normal("y2", mu, 2, observed=np.array([0.3]))
            idata = pm.sample(draws=20, tune=20, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=12)
        ll = pm.compute_log_likelihood(idata, model=model)
        assert set(ll.log_likelihood.data_vars) == {"y1", "y2"}
        assert ll.log_likelihood["y1"].values.shape == (1, 20, 2)
        assert ll.log_likelihood["y2"].values.shape == (1, 20, 1)

    def test_constant_data_group(self):
        with pm.Model() as model:
            x = pm.Data("x", np.array([1.0, 2.0, 3.0]))
            beta = pm.Normal("beta", 0, 1)
            pm.Normal("obs", beta * x, 1, observed=np.array([0.1, 0.2, 0.3]))
            idata = pm.sample(draws=10, tune=10, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=13)
        assert "constant_data" in idata.groups()
        np.testing.assert_allclose(
            np.asarray(idata.constant_data["x"].values), [1.0, 2.0, 3.0]
        )
        assert "obs" in idata.observed_data

    def test_missing_data_model_groups(self):
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            with pytest.warns(ImputationWarning):
                pm.Normal("y", mu, 1, observed=np.array([0.5, np.nan, 1.5]))
            idata = pm.sample(draws=20, tune=20, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=14)
        post = idata.posterior
        assert "y_unobserved" in post
        assert post["y_unobserved"].values.shape == (1, 20, 1)
        # combined deterministic has the full length
        assert post["y"].values.shape == (1, 20, 3)

    def test_multivariate_observations_dims(self):
        with pm.Model(coords={"obs_id": range(4), "axis": list("ab")}) as model:
            mu = pm.Normal("mu", 0, 1, dims="axis")
            pm.MvNormal("y", mu, cov=np.eye(2),
                        observed=np.random.default_rng(0).normal(size=(4, 2)),
                        dims=("obs_id", "axis"))
            idata = pm.sample(draws=10, tune=10, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=15)
        assert idata.observed_data["y"].dims == ("obs_id", "axis")
        assert idata.posterior["mu"].dims == ("chain", "draw", "axis")


class TestWarmupHandling:
    @pytest.mark.parametrize("discard", [True, False])
    def test_warmup_groups(self, discard):
        with pm.Model() as model:
            pm.Normal("x", 0, 1)
            idata = pm.sample(
                draws=15, tune=10, chains=2, discard_tuned_samples=discard,
                progressbar=False, compute_convergence_checks=False,
                random_seed=16,
            )
        assert idata.posterior["x"].values.shape == (2, 15)
        if discard:
            assert "warmup_posterior" not in idata.groups()
        else:
            assert "warmup_posterior" in idata.groups()
            assert idata.warmup_posterior["x"].values.shape == (2, 10)
            assert "warmup_sample_stats" in idata.groups()


class TestPosteriorPredictiveShapes:
    def test_ppc_keeps_chain_draw_shape(self, school_model_idata):
        model, idata = school_model_idata
        ppc = pm.sample_posterior_predictive(
            idata, model=model, progressbar=False, random_seed=17
        )
        assert ppc.posterior_predictive["obs"].values.shape == (2, 60, 8)
        assert ppc.posterior_predictive["obs"].dims == ("chain", "draw", "school")

    def test_predictions_group(self, school_model_idata):
        model, idata = school_model_idata
        preds = pm.sample_posterior_predictive(
            idata, model=model, predictions=True, progressbar=False,
            random_seed=18,
        )
        assert "predictions" in preds.groups()


class TestConversionSubsets:
    def test_var_names_subset_conversion(self):
        with pm.Model() as model:
            pm.Normal("a", 0, 1)
            pm.Normal("b", 0, 1)
            idata = pm.sample(draws=10, tune=10, chains=1, var_names=["a"],
                              progressbar=False,
                              compute_convergence_checks=False, random_seed=19)
        assert "a" in idata.posterior
        assert "b" not in idata.posterior

    def test_single_chain(self):
        with pm.Model() as model:
            pm.Normal("x", 0, 1)
            idata = pm.sample(draws=10, tune=10, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=20)
        assert idata.posterior["x"].values.shape == (1, 10)

    def test_potential_only_model_converts(self):
        with pm.Model() as model:
            x = pm.Normal("x", 0, 1)
            pm.Potential("pot", -0.5 * x**2)
            idata = pm.sample(draws=10, tune=10, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=21)
        assert "x" in idata.posterior
        assert "observed_data" not in idata.groups()
