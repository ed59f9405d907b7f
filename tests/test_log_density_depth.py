"""compute_log_likelihood / compute_log_prior depth battery.

Ports the case inventory of reference tests/stats/test_log_density.py
(basic+transform:32, multivariate:54, var_names:75, invalid:115,
dims-without-coords:124, log_prior basic:140, deterministic:162)
against scipy oracles.
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.backends.inference_data import DataVar, Dataset, InferenceData


def _idata_posterior(**arrays):
    ds = Dataset({
        k: DataVar(k, v, dims=("chain", "draw") + tuple(
            f"{k}_dim_{i}" for i in range(np.ndim(v) - 2)))
        for k, v in arrays.items()
    })
    return InferenceData(posterior=ds)


class TestComputeLogLikelihood:
    @pytest.mark.parametrize("transform", (False, True))
    def test_basic(self, transform):
        with pm.Model(coords={"test_dim": range(3)}) as m:
            if transform:
                pm.LogNormal("x")  # transformed free var; posterior is in
                # rv space either way
            else:
                pm.Normal("x")
            pm.Normal("y", m["x"], 1.0, observed=[0.0, 1.0, 2.0],
                      dims=("test_dim",))
        x_draws = (np.arange(100).reshape(4, 25) + 1.0) / 10.0
        idata = _idata_posterior(x=x_draws)
        res = pm.compute_log_likelihood(idata, model=m, progressbar=False)
        assert res is idata
        ll = res.log_likelihood["y"]
        assert ll.shape == (4, 25, 3)
        assert ll.dims == ("chain", "draw", "test_dim")
        np.testing.assert_allclose(
            ll.values,
            st.norm.logpdf([0, 1, 2],
                           x_draws.reshape(-1)[:, None]).reshape(4, 25, 3),
            rtol=1e-6,
        )

    def test_multivariate(self):
        """Dirichlet observations: one log-likelihood entry per EVENT row."""
        rng = np.random.default_rng(39)
        p_draws = rng.normal(size=(4, 25, 3))
        y_draws = st.dirichlet(np.ones(3)).rvs(10, random_state=rng)
        with pm.Model(coords={"test_event_dim": range(10),
                              "test_support_dim": range(3)}) as m:
            p = pm.Normal("p", dims=("test_support_dim",))
            pm.Dirichlet("y", a=pm.math.exp(p), observed=y_draws,
                         dims=("test_event_dim", "test_support_dim"))
        idata = _idata_posterior(p=p_draws)
        res = pm.compute_log_likelihood(idata, model=m, progressbar=False)
        ll = res.log_likelihood["y"]
        assert ll.shape == (4, 25, 10)
        expected = np.stack([
            st.dirichlet(a).logpdf(y_draws.T)
            for a in np.exp(p_draws.reshape(-1, 3))
        ]).reshape(4, 25, 10)
        np.testing.assert_allclose(ll.values, expected, rtol=1e-5)

    def test_var_names(self):
        with pm.Model() as m:
            x = pm.Normal("x")
            pm.Normal("y1", x, 1.0, observed=[0.0, 1.0, 2.0])
            pm.Normal("y2", x, 1.0, observed=[3.0, 4.0])
        x_draws = np.arange(100).reshape(4, 25).astype(float)
        idata = _idata_posterior(x=x_draws)

        res_y1 = pm.compute_log_likelihood(
            idata, var_names=["y1"], extend_inferencedata=False, model=m,
            progressbar=False,
        )
        assert res_y1 is not idata
        assert set(res_y1.data_vars) == {"y1"}
        np.testing.assert_allclose(
            res_y1["y1"].values,
            st.norm.logpdf([0, 1, 2],
                           x_draws.reshape(-1)[:, None]).reshape(4, 25, 3),
            rtol=1e-6,
        )
        res_both = pm.compute_log_likelihood(idata, model=m,
                                             progressbar=False)
        assert res_both is idata
        assert set(res_both.log_likelihood.data_vars.keys()) == {"y1", "y2"}
        np.testing.assert_allclose(
            res_both.log_likelihood["y1"].values, res_y1["y1"].values
        )

    def test_invalid_var_names(self):
        with pm.Model() as m:
            x = pm.Normal("x")
            pm.Normal("y", x, 1.0, observed=[0.0, 1.0, 2.0])
        idata = _idata_posterior(x=np.arange(100).reshape(4, 25).astype(float))
        with pytest.raises(ValueError,
                           match="var_names must refer to observed_RVs"):
            pm.compute_log_likelihood(idata, var_names=["x"], model=m,
                                      progressbar=False)

    def test_dims_without_coords(self):
        """reference issue #6820: a dim declared by shape only still labels
        the log-likelihood."""
        with pm.Model() as m:
            x = pm.Normal("x")
            pm.Normal("y", x, 1.0, observed=[0.0, 0.0, 0.0], shape=(3,),
                      dims="obs")
        idata = _idata_posterior(x=np.array([[0.0, 1.0]]))
        res = pm.compute_log_likelihood(idata, model=m, progressbar=False)
        ll = res.log_likelihood["y"]
        assert ll.shape == (1, 2, 3)
        assert ll.dims[-1] == "obs"
        np.testing.assert_allclose(
            ll.values, st.norm.logpdf([[[0, 0, 0], [1, 1, 1]]]), rtol=1e-6
        )


class TestComputeLogPrior:
    @pytest.mark.parametrize("transform", (False, True))
    def test_basic(self, transform):
        with pm.Model() as m:
            if transform:
                pm.HalfNormal("x")
            else:
                pm.Normal("x")
            pm.Normal("y", m["x"], 1.0, observed=[0.0, 1.0, 2.0])
        x_draws = (np.arange(100).reshape(4, 25) + 1.0) / 10.0
        idata = _idata_posterior(x=x_draws)
        res = pm.compute_log_prior(idata, model=m, progressbar=False)
        assert res is idata
        lp = res.log_prior["x"]
        assert lp.shape == (4, 25)
        oracle = (
            st.halfnorm.logpdf(x_draws) if transform
            else st.norm.logpdf(x_draws)
        )
        np.testing.assert_allclose(lp.values, oracle, rtol=1e-6)

    def test_deterministic_excluded(self):
        with pm.Model() as m:
            x = pm.Normal("x")
            pm.Deterministic("d", 2 * x)
            pm.Normal("y", x, 1.0, observed=[0.0, 1.0, 2.0])
        idata = _idata_posterior(x=np.arange(100).reshape(4, 25).astype(float))
        res = pm.compute_log_prior(idata, model=m, progressbar=False)
        assert "x" in res.log_prior
        assert "d" not in res.log_prior
