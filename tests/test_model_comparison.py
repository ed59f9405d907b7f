"""PSIS-LOO / WAIC / compare against closed forms and scipy oracles.

Mirrors the reference's arviz-delegated surface (pymc/stats/__init__.py);
oracle strategy: exact conjugate leave-one-out predictive densities and a
scipy.genpareto parameter-recovery check for the GPD fit.
"""
import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.stats.model_comparison import _gpdfit, _psislw


def _fit_normal_model(y, prior_sd, seed=0):
    with pm.Model() as m:
        pm.Normal("mu", 0, prior_sd)
        pm.Normal("y", m["mu"], 1.0, observed=y)
    idata = pm.sample(
        draws=1000, tune=500, chains=4, model=m, random_seed=seed,
        progressbar=False, compute_convergence_checks=False,
    )
    return m, idata


class TestGPDFit:
    @pytest.mark.parametrize("k_true", [0.2, 0.5])
    def test_recovers_scipy_genpareto_params(self, k_true):
        from scipy import stats as st

        x = np.sort(
            st.genpareto.rvs(k_true, scale=1.5, size=4000, random_state=0)
        )
        k, sigma = _gpdfit(x)
        assert abs(k - k_true) < 0.1
        assert abs(sigma - 1.5) < 0.25

    def test_psislw_normalized(self):
        rng = np.random.default_rng(1)
        lw, k = _psislw(rng.normal(size=2000))
        np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-8)
        assert np.isfinite(k)


class TestLooWaic:
    def test_loo_matches_exact_conjugate_loo(self):
        from scipy import stats as st

        rng = np.random.default_rng(3)
        y = rng.normal(0.7, 1.0, 40)
        m, idata = _fit_normal_model(y, prior_sd=10.0)
        res = pm.loo(idata, model=m)
        # exact LOO: p(y_i | y_-i) = N(mu_n(-i), 1 + V_n(-i)), conjugate
        s0sq = 100.0
        exact = 0.0
        for i in range(len(y)):
            yi = np.delete(y, i)
            Vn = 1.0 / (1.0 / s0sq + len(yi))
            mn = Vn * yi.sum()
            exact += st.norm.logpdf(y[i], mn, np.sqrt(1.0 + Vn))
        assert abs(res.elpd - exact) < 0.5
        assert (np.asarray(res.pareto_k) < 0.7).all()
        assert 0.3 < res.p < 3.0  # ~1 effective parameter
        # arviz-style attribute aliases
        assert res.elpd_loo == res.elpd

    def test_waic_close_to_loo(self):
        rng = np.random.default_rng(4)
        y = rng.normal(0.0, 1.0, 30)
        m, idata = _fit_normal_model(y, prior_sd=5.0)
        lo, wa = pm.loo(idata, model=m), pm.waic(idata, model=m)
        assert abs(lo.elpd - wa.elpd) < 1.0
        assert wa.p_waic == wa.p

    def test_compare_ranks_and_weights(self):
        rng = np.random.default_rng(5)
        y = rng.normal(0.7, 1.0, 40)
        m1, i1 = _fit_normal_model(y, prior_sd=10.0)
        m2, i2 = _fit_normal_model(y, prior_sd=0.01, seed=1)
        df = pm.compare(
            {"good": i1, "bad": i2}, model_dict={"good": m1, "bad": m2}
        )
        assert list(df.index) == ["good", "bad"]
        assert df.loc["good", "rank"] == 0
        assert df.loc["good", "elpd_loo"] > df.loc["bad", "elpd_loo"]
        assert df.loc["good", "weight"] > df.loc["bad", "weight"]
        np.testing.assert_allclose(df["weight"].sum(), 1.0, rtol=1e-6)
        assert df.loc["good", "elpd_diff"] == 0.0


class TestStackingStability:
    def test_widely_separated_elpds_no_overflow(self):
        # Round-1 weak #8: widely separated pointwise elpds overflowed exp()
        # in the GPD profile-likelihood softmax. Must run warning-free and
        # put ~all weight on the dominant model.
        import warnings
        from pymc_tpu.stats.model_comparison import _stacking_weights, _gpdfit

        rng = np.random.default_rng(0)
        N = 200
        elpd = np.stack(
            [rng.normal(-1.0, 0.1, N), rng.normal(-400.0, 5.0, N)], axis=1
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            w = _stacking_weights(elpd)
            # heavy-tailed exceedances with huge dynamic range
            x = np.sort(rng.pareto(0.5, 500) * 1e6 + 1e-3)
            k, sigma = _gpdfit(x)
        assert w[0] > 0.99
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
        assert np.isfinite(k) and np.isfinite(sigma)
