"""Data-container contracts beyond the basics.

Mirrors reference tests/test_data.py (test_shared_data_as_index,
test_shared_data_as_rv_input, test_shared_scalar_as_rv_input,
test_data_naming, test_set_data_to_non_data_container_variables,
test_masked_array_error, test_implicit_coords_series/dataframe,
test_scaling_data_works_in_likelihood) — pm.Data here is a DataNode with
version-stamped live shapes (graph.py), so set_data retraces downstream
jitted programs automatically.
"""

import numpy as np
import pandas as pd
import pytest

import pymc_tpu as pm


class TestSharedDataUsage:
    def test_shared_data_as_index(self):
        """Reference test_shared_data_as_index: integer pm.Data indexes an
        RV; predictions re-resolve after set_data."""
        with pm.Model() as model:
            index = pm.Data("index", np.array([2, 0, 1, 0, 2]))
            y = pm.Data("y", [1.0, 2.0, 3.0, 2.0, 1.0])
            alpha = pm.Normal("alpha", 0, 1.5, size=3)
            pm.Normal("obs", alpha[index], 0.1, observed=y,
                      shape=index.shape)
        prior = pm.sample_prior_predictive(draws=50, model=model,
                                           random_seed=0)
        assert prior.prior["alpha"].shape == (1, 50, 3)
        idata = pm.sample(draws=150, tune=200, chains=1, model=model,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False)
        assert idata.posterior["alpha"].shape == (1, 150, 3)

        with model:
            pm.set_data({"index": np.array([0, 1, 2]), "y": [5.0, 6.0, 9.0]})
            pp = pm.sample_posterior_predictive(
                idata, var_names=["obs"], random_seed=2, progressbar=False
            )
        assert pp.posterior_predictive["obs"].shape == (1, 150, 3)

    def test_shared_data_as_rv_input(self):
        """Reference test_shared_data_as_rv_input: posterior tracks the
        container contents across set_data."""
        with pm.Model() as m:
            x = pm.Data("x", [1.0, 2.0, 3.0])
            pm.Normal("y", mu=x, sigma=0.01, size=(2, 3))
        idata = pm.sample(draws=250, tune=200, chains=1, model=m,
                          random_seed=3, progressbar=False,
                          compute_convergence_checks=False)
        np.testing.assert_allclose(
            idata.posterior["y"].values.mean(axis=(0, 1)),
            np.broadcast_to([1.0, 2.0, 3.0], (2, 3)),
            atol=0.1,
        )
        with m:
            pm.set_data({"x": np.array([2.0, 4.0, 6.0])})
        idata2 = pm.sample(draws=250, tune=200, chains=1, model=m,
                           random_seed=4, progressbar=False,
                           compute_convergence_checks=False)
        np.testing.assert_allclose(
            idata2.posterior["y"].values.mean(axis=(0, 1)),
            np.broadcast_to([2.0, 4.0, 6.0], (2, 3)),
            atol=0.1,
        )

    def test_shared_scalar_as_rv_input(self):
        with pm.Model() as m:
            s = pm.Data("s", 5.0)
            pm.Normal("v", mu=s, sigma=0.01, size=1)
        idata = pm.sample(draws=200, tune=200, chains=1, model=m,
                          random_seed=5, progressbar=False,
                          compute_convergence_checks=False)
        np.testing.assert_allclose(
            idata.posterior["v"].values.mean(), 5.0, atol=0.05
        )
        with m:
            pm.set_data({"s": 10.0})
        idata2 = pm.sample(draws=200, tune=200, chains=1, model=m,
                           random_seed=6, progressbar=False,
                           compute_convergence_checks=False)
        np.testing.assert_allclose(
            idata2.posterior["v"].values.mean(), 10.0, atol=0.05
        )


class TestDataValidation:
    def test_masked_array_error(self):
        """Reference test_masked_array_error."""
        with pm.Model():
            with pytest.raises(NotImplementedError, match="Masked arrays"):
                pm.Data("x", [0.0, 1.0, np.nan, 2.0])
        with pm.Model():
            with pytest.raises(NotImplementedError, match="Masked arrays"):
                pm.Data("m", np.ma.MaskedArray([1.0, 2.0], mask=[0, 1]))

    def test_set_data_to_non_data_container(self):
        """Reference test_set_data_to_non_data_container_variables."""
        with pm.Model() as m:
            pm.Normal("beta", 0, 1)
        with pytest.raises(TypeError, match="pm.Data container"):
            m.set_data("beta", [1.0, 2.0])

    def test_data_naming_nested_models(self):
        """Reference test_data_naming: containers get the model prefix."""
        with pm.Model("named_model") as m:
            x = pm.Data("x", [1.0, 2.0, 3.0])
            assert x.name == "named_model::x"

    def test_creation_outside_model_context_fails(self):
        with pytest.raises(TypeError, match="model"):
            pm.Data("x", [1.0])


class TestImplicitPandas:
    def test_series_and_dataframe_inputs(self):
        """Reference test_implicit_coords_series/dataframe: pandas inputs
        convert cleanly."""
        ser = pd.Series([1.0, 2.0, 3.0], name="sales")
        df = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
        with pm.Model() as m:
            s = pm.Data("ser", ser)
            d = pm.Data("df", df)
        assert tuple(s.shape) == (3,)
        assert tuple(d.shape) == (2, 2)
        np.testing.assert_allclose(np.asarray(m["ser"].get_value()), ser.values)


class TestScalingInLikelihood:
    def test_total_size_rescales_with_set_data(self):
        """Reference test_scaling_data_works_in_likelihood: the logp scale
        follows the container size."""
        data = np.random.default_rng(7).normal(0.0, 1.0, 100)
        with pm.Model() as m:
            x = pm.Data("x", data)
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("obs", mu, 1.0, observed=x, shape=x.shape)
        lp_full = float(m.compile_logp()({"mu": 0.0}))
        with m:
            pm.set_data({"x": data[:10]})
        lp_small = float(m.compile_logp()({"mu": 0.0}))
        assert lp_small > lp_full  # fewer terms -> larger (less negative)
