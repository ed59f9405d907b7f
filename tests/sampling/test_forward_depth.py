"""Forward-sampling depth battery (gaps vs the reference inventory).

Ports reference tests/sampling/test_forward.py cases not covered by the
existing forward batteries: observed-data-free predictions resize (:1114),
set_data batch loops with seed reproducibility (:1393/:1433), point-list
posterior input (:1458), coord-length volatility (:434), prior predictive
pytensor-kwargs-free draw contracts (:1176 select cases).
"""

import warnings

import numpy as np
import pytest

import pymc_tpu as pm


class TestSetDataBatches:
    def test_forward_reuse_across_set_data_batches(self):
        """reference test_forward_function_reused_across_set_data_batches:
        predictions track each new data batch (no stale cache), including a
        resize."""
        rng = np.random.default_rng(0)
        N = 30
        with pm.Model() as m:
            x = pm.Data("x", rng.normal(size=N))
            a = pm.Normal("a", 0, 1)
            b = pm.Normal("b", 0, 1)
            pm.Normal("y", a + b * x, 1, observed=rng.normal(size=N),
                      shape=x.shape)
            idata = pm.sample(draws=20, tune=20, chains=2,
                              progressbar=False, random_seed=1,
                              compute_convergence_checks=False)

        results = []
        for i in range(3):
            with m:
                pm.set_data({"x": rng.normal(size=N)})
                pp = pm.sample_posterior_predictive(
                    idata, progressbar=False, random_seed=i)
            results.append(pp.posterior_predictive["y"].values.copy())
        assert not np.allclose(results[0], results[1])
        assert not np.allclose(results[1], results[2])
        # resize flows through
        with m:
            pm.set_data({"x": rng.normal(size=2 * N)})
            pp = pm.sample_posterior_predictive(
                idata, progressbar=False, random_seed=0)
        assert pp.posterior_predictive["y"].shape[-1] == 2 * N

    def test_reproducible_across_seeds_after_set_data(self):
        """reference test_reused_forward_function_is_reproducible_across_seeds."""
        rng = np.random.default_rng(0)
        N = 20
        with pm.Model() as m:
            x = pm.Data("x", rng.normal(size=N))
            a = pm.Normal("a", 0, 1)
            pm.Normal("y", a * x, 1, observed=rng.normal(size=N),
                      shape=x.shape)
            idata = pm.sample(draws=20, tune=20, chains=2,
                              progressbar=False, random_seed=2,
                              compute_convergence_checks=False)
        with m:
            pm.set_data({"x": rng.normal(size=N)})
            pp_a = pm.sample_posterior_predictive(idata, progressbar=False,
                                                  random_seed=42)
            pp_b = pm.sample_posterior_predictive(idata, progressbar=False,
                                                  random_seed=42)
            pp_c = pm.sample_posterior_predictive(idata, progressbar=False,
                                                  random_seed=43)
        ya = pp_a.posterior_predictive["y"].values
        np.testing.assert_allclose(ya, pp_b.posterior_predictive["y"].values)
        assert not np.allclose(ya, pp_c.posterior_predictive["y"].values)


def test_observed_data_free_predictions_resize():
    """reference test_observed_data_needed_in_pp (first half): when the
    observed target does not feed the generative graph, predictions at a
    new x size need no dummy y."""
    rng = np.random.default_rng(3)
    with pm.Model(coords={"trial": range(5)}) as m:
        x_data = pm.Data("x_data", rng.normal(size=(5, 3)))
        sigma = pm.HalfNormal("sigma")
        mu = pm.math.sum(x_data, axis=-1)
        pm.Normal("y", mu=mu, sigma=sigma, observed=rng.normal(size=(5,)),
                  shape=mu.shape, dims=("trial",))
        prior = pm.sample_prior_predictive(draws=25, random_seed=4)

    with m:
        pm.set_data({"x_data": rng.normal(size=(2, 3))},
                    coords={"trial": range(2)})
        pp = pm.sample_posterior_predictive(
            prior.prior, predictions=True, progressbar=False, random_seed=5)
    assert pp.predictions["y"].shape == (1, 25, 2)


def test_point_list_posterior_input():
    """reference test_point_list_arg_bug_spp: a list of point dicts is a
    valid trace argument."""
    rng = np.random.default_rng(6)
    with pm.Model() as m:
        n = pm.Normal("n")
        pm.Normal("y", n, 1.0, observed=rng.normal(size=4))
        pm.Deterministic("d", n * 4)
        points = [{"n": float(v)} for v in np.linspace(-1, 1, 7)]
        pp = pm.sample_posterior_predictive(
            points, var_names=["d", "y"], progressbar=False, random_seed=7)
    d = pp.posterior_predictive["d"].values
    assert d.shape == (1, 7)
    np.testing.assert_allclose(d[0], np.linspace(-1, 1, 7) * 4, rtol=1e-6)
    assert pp.posterior_predictive["y"].shape == (1, 7, 4)


def test_raw_dict_posterior_input():
    """A {name: (chain, draw, ...) array} dict works as the trace."""
    rng = np.random.default_rng(8)
    with pm.Model() as m:
        n = pm.Normal("n")
        pm.Normal("y", n, 0.1, observed=rng.normal(size=3))
        pp = pm.sample_posterior_predictive(
            {"n": np.full((2, 5), 10.0)}, progressbar=False, random_seed=9)
    y = pp.posterior_predictive["y"].values
    assert y.shape == (2, 5, 3)
    assert np.all(np.abs(y - 10.0) < 1.0)


class TestCoordLengthVolatility:
    """reference test_length_coords_volatile, behavioral port."""

    def _model(self):
        with pm.Model(coords={"trial": range(3)}) as model:
            x = pm.Normal("x", dims="trial")
            pm.Deterministic("y", pm.math.mean(x))
        return model

    def test_same_length_uses_trace(self):
        model = self._model()
        trace = {"x": np.full((1, 1, 3), np.pi)}
        with model:
            pp = pm.sample_posterior_predictive(
                trace, var_names=["y"], progressbar=False, random_seed=1)
        np.testing.assert_allclose(
            float(pp.posterior_predictive["y"].values), np.pi, rtol=1e-6)

    def test_resampled_x_changes_y(self):
        model = self._model()
        trace = {"x": np.full((1, 1, 3), np.pi)}
        with model:
            pp = pm.sample_posterior_predictive(
                trace, var_names=["y"], sample_vars=["x"],
                progressbar=False, random_seed=2)
        assert float(pp.posterior_predictive["y"].values) != np.pi
