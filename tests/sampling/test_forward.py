"""Forward sampling tests (mirrors reference tests/sampling/test_forward.py)."""

import numpy as np
import pytest

import pymc_tpu as pm


@pytest.fixture
def simple_model():
    y = np.random.default_rng(0).normal(1.0, 1.0, 50)
    with pm.Model(coords={"obs": np.arange(50)}) as m:
        mu = pm.Normal("mu", 0, 5)
        sigma = pm.HalfNormal("sigma", 2)
        dbl = pm.Deterministic("dbl", 2 * mu)
        pm.Normal("y", mu, sigma, observed=y, dims="obs")
    return m, y


class TestPriorPredictive:
    def test_groups_and_shapes(self, simple_model):
        m, y = simple_model
        idata = pm.sample_prior_predictive(draws=100, model=m, random_seed=1)
        assert "prior" in idata.groups()
        assert "prior_predictive" in idata.groups()
        assert idata.prior["mu"].shape == (1, 100)
        assert idata.prior["dbl"].shape == (1, 100)
        assert idata.prior_predictive["y"].shape == (1, 100, 50)
        np.testing.assert_allclose(
            idata.prior["dbl"].values, 2 * idata.prior["mu"].values
        )

    def test_statistics(self, simple_model):
        m, _ = simple_model
        idata = pm.sample_prior_predictive(draws=3000, model=m, random_seed=2)
        mu_draws = idata.prior["mu"].values
        assert abs(mu_draws.mean()) < 0.3
        assert abs(mu_draws.std() - 5) < 0.3
        sig = idata.prior["sigma"].values
        assert np.all(sig > 0)

    def test_hierarchical_dependency(self):
        with pm.Model() as m:
            a = pm.Normal("a", 10.0, 0.001)
            b = pm.Normal("b", a, 0.001)
        idata = pm.sample_prior_predictive(draws=500, model=m, random_seed=3)
        np.testing.assert_allclose(
            idata.prior["b"].values.mean(), 10.0, atol=0.01
        )

    def test_var_names(self, simple_model):
        m, _ = simple_model
        idata = pm.sample_prior_predictive(
            draws=10, model=m, var_names=["mu"], random_seed=4
        )
        assert "mu" in idata.prior
        assert "sigma" not in idata.prior


class TestPosteriorPredictive:
    def test_roundtrip(self, simple_model):
        m, y = simple_model
        idata = pm.sample(draws=200, tune=200, chains=2, model=m, random_seed=5,
                          progressbar=False, compute_convergence_checks=False)
        ppc = pm.sample_posterior_predictive(idata, model=m, random_seed=6)
        assert ppc.posterior_predictive["y"].shape == (2, 200, 50)
        # predictive mean close to observed mean
        assert abs(ppc.posterior_predictive["y"].values.mean() - y.mean()) < 0.5

    def test_extend(self, simple_model):
        m, _ = simple_model
        idata = pm.sample(draws=100, tune=150, chains=2, model=m, random_seed=7,
                          progressbar=False, compute_convergence_checks=False)
        out = pm.sample_posterior_predictive(
            idata, model=m, extend_inferencedata=True, random_seed=8
        )
        assert "posterior_predictive" in out.groups()
        assert "posterior" in out.groups()

    def test_var_names_deterministic(self, simple_model):
        m, _ = simple_model
        idata = pm.sample(draws=50, tune=100, chains=2, model=m, random_seed=9,
                          progressbar=False, compute_convergence_checks=False)
        ppc = pm.sample_posterior_predictive(
            idata, model=m, var_names=["y", "dbl"], random_seed=10
        )
        np.testing.assert_allclose(
            ppc.posterior_predictive["dbl"].values,
            2 * idata.posterior["mu"].values,
        )


class TestComputeHelpers:
    def test_compute_deterministics(self, simple_model):
        m, _ = simple_model
        idata = pm.sample(draws=50, tune=100, chains=2, model=m, random_seed=11,
                          progressbar=False, compute_convergence_checks=False)
        ds = pm.compute_deterministics(idata, model=m)
        np.testing.assert_allclose(
            ds["dbl"].values, 2 * idata.posterior["mu"].values
        )

    def test_compute_log_likelihood(self, simple_model):
        import scipy.stats as st

        m, y = simple_model
        idata = pm.sample(draws=50, tune=100, chains=2, model=m, random_seed=12,
                          progressbar=False, compute_convergence_checks=False)
        out = pm.compute_log_likelihood(idata, model=m)
        assert "log_likelihood" in out.groups()
        ll = out.log_likelihood["y"].values
        assert ll.shape == (2, 50, 50)
        mu0 = idata.posterior["mu"].values[0, 0]
        sig0 = idata.posterior["sigma"].values[0, 0]
        np.testing.assert_allclose(
            ll[0, 0], st.norm.logpdf(y, mu0, sig0), rtol=1e-6
        )

    def test_compute_log_prior(self, simple_model):
        m, _ = simple_model
        idata = pm.sample(draws=50, tune=100, chains=2, model=m, random_seed=13,
                          progressbar=False, compute_convergence_checks=False)
        out = pm.compute_log_prior(idata, model=m)
        assert "log_prior" in out.groups()
        assert out.log_prior["mu"].shape == (2, 50)


class TestDraw:
    def test_draw_node(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
        draws = pm.draw(x, draws=100, random_seed=14)
        assert np.asarray(draws).shape == (100,)

    def test_draw_dist(self):
        d = pm.Gamma.dist(2.0, 1.0)
        draws = pm.draw(d, draws=500, random_seed=15)
        assert np.asarray(draws).shape == (500,)
        assert np.all(np.asarray(draws) > 0)


class TestSetDataPredictions:
    def test_out_of_sample_predictions_resize(self):
        # the reference's canonical mutable-data prediction pattern:
        # shape=x.shape keeps the observed RV's size tied to the container
        rng = np.random.default_rng(0)
        Xtr, Xte = rng.normal(size=40), rng.normal(size=7)
        ytr = 2.0 * Xtr + 0.5 + rng.normal(0, 0.3, 40)
        with pm.Model() as m:
            x = pm.MutableData("x", Xtr)
            a = pm.Normal("a", 0, 5)
            b = pm.Normal("b", 0, 5)
            sd = pm.HalfNormal("sd", 1)
            pm.Normal("y", a + b * x, sd, observed=ytr, shape=x.shape)
        idata = pm.sample(
            draws=300, tune=300, chains=2, model=m, random_seed=1,
            progressbar=False, compute_convergence_checks=False,
        )
        with m:
            pm.set_data({"x": Xte})
            pp = pm.sample_posterior_predictive(
                idata, predictions=True, progressbar=False
            )
        vals = pp.predictions["y"].values
        assert vals.shape == (2, 300, 7)
        np.testing.assert_allclose(
            vals.mean(axis=(0, 1)), 2.0 * Xte + 0.5, atol=0.5
        )

    def test_same_size_set_data_changes_predictions(self):
        rng = np.random.default_rng(1)
        X1, X2 = rng.normal(size=10), rng.normal(size=10) + 10
        with pm.Model() as m:
            x = pm.MutableData("x", X1)
            b = pm.Normal("b", 0, 5)
            pm.Normal("y", b * x, 0.1, observed=2 * X1, shape=x.shape)
        idata = pm.sample(draws=200, tune=200, chains=2, model=m,
                          random_seed=2, progressbar=False,
                          compute_convergence_checks=False)
        with m:
            pm.set_data({"x": X2})
            pp = pm.sample_posterior_predictive(idata, progressbar=False)
        mean = pp.posterior_predictive["y"].values.mean(axis=(0, 1))
        np.testing.assert_allclose(mean, 2 * X2, rtol=0.1)


def test_potentials_warn_in_forward_sampling():
    """reference forward.py:548,1096: Potentials are ignored in forward
    sampling and the user must be told."""
    import warnings

    with pm.Model() as m:
        x = pm.Normal("x", 0, 1)
        pm.Potential("pen", -0.5 * x**2)
        pm.Normal("y", x, 1, observed=np.zeros(3))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pm.sample_prior_predictive(draws=10, model=m, random_seed=0)
        assert any("Potentials" in str(x.message) for x in w)
    idata = pm.sample(draws=20, tune=20, chains=2, model=m, random_seed=0,
                      progressbar=False, compute_convergence_checks=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pm.sample_posterior_predictive(idata, model=m, random_seed=1,
                                       progressbar=False)
        assert any("Potentials" in str(x.message) for x in w)
