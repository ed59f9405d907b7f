"""VI accuracy suite (reference tests/variational/test_inference.py:
each method fit on a known conjugate posterior; ELBO convergence; minibatch
total_size scaling; callbacks; Empirical resampling)."""

import numpy as np
import pytest

import pymc_tpu as pm


def _conjugate_model(n=100, seed=0):
    """y ~ N(mu, 1), mu ~ N(0, 1): posterior mu | y = N(s*ybar*n/(n+1)...)
    — exact normal posterior."""
    rng = np.random.default_rng(seed)
    y = rng.normal(1.0, 1.0, n)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0.0, 1.0)
        pm.Normal("y", mu, 1.0, observed=y)
    post_var = 1.0 / (1.0 + n)
    post_mean = y.sum() * post_var
    return m, post_mean, np.sqrt(post_var)


class TestMethodsRecoverPosterior:
    @pytest.mark.parametrize("method,n_iter,tol_mean,tol_sd", [
        ("advi", 15000, 0.05, 0.05),
        ("fullrank_advi", 15000, 0.05, 0.05),
        ("svgd", 1500, 0.05, 0.05),
        ("asvgd", 500, 0.08, 0.10),
    ])
    def test_fit(self, method, n_iter, tol_mean, tol_sd):
        m, post_mean, post_sd = _conjugate_model()
        approx = pm.fit(n_iter, method=method, model=m, random_seed=1,
                        progressbar=False)
        idata = approx.sample(4000, random_seed=2)
        draws = idata.posterior["mu"].values.ravel()
        np.testing.assert_allclose(draws.mean(), post_mean, atol=tol_mean)
        np.testing.assert_allclose(draws.std(), post_sd, atol=tol_sd)

    def test_fullrank_learns_correlation(self):
        # strongly correlated 2-d Gaussian: fullrank must capture the
        # off-diagonal that meanfield cannot
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        with pm.Model() as m:
            pm.MvNormal("x", mu=np.zeros(2), cov=cov)
        approx = pm.fit(20000, method="fullrank_advi", model=m,
                        random_seed=3, progressbar=False)
        draws = approx.sample(6000, random_seed=4).posterior["x"].values
        draws = draws.reshape(-1, 2)
        corr = np.corrcoef(draws.T)[0, 1]
        assert corr > 0.7, corr


class TestMinibatchScaling:
    def test_total_size_matches_full_fit(self):
        rng = np.random.default_rng(5)
        data = rng.normal(0.8, 1.0, 1000)
        with pm.Model() as m_full:
            mu = pm.Normal("mu", 0.0, 10.0)
            pm.Normal("y", mu, 1.0, observed=data)
        full = pm.fit(12000, model=m_full, random_seed=6, progressbar=False)

        with pm.Model() as m_mb:
            mu = pm.Normal("mu", 0.0, 10.0)
            mb = pm.Minibatch(data, batch_size=100)
            pm.Normal("y", mu, 1.0, observed=mb, total_size=1000)
        mini = pm.fit(12000, model=m_mb, random_seed=6, progressbar=False)

        f = full.sample(3000, random_seed=7).posterior["mu"].values
        g = mini.sample(3000, random_seed=7).posterior["mu"].values
        np.testing.assert_allclose(f.mean(), g.mean(), atol=0.05)
        np.testing.assert_allclose(f.std(), g.std(), rtol=0.5)


class TestCallbacksAndTracking:
    def test_tracker_and_convergence_callback(self):
        m, _, _ = _conjugate_model()
        from pymc_tpu.variational.callbacks import (
            CheckParametersConvergence,
            Tracker,
        )

        # reference contract: zero-arg callables work, else (approx, hist, i)
        ticks = []
        tracker = Tracker(
            mean=lambda approx, hist, i: np.asarray(approx.mean).copy(),
            tick=lambda: ticks.append(1) or 1,
        )
        cb = CheckParametersConvergence(every=500, tolerance=1e-3)
        approx = pm.fit(8000, model=m, random_seed=8, progressbar=False,
                        callbacks=[tracker, cb])
        assert len(tracker["mean"]) > 0
        assert len(tracker["tick"]) == len(tracker["mean"])
        assert np.isfinite(approx.hist[-100:]).all()

    def test_elbo_hist_decreases(self):
        m, _, _ = _conjugate_model()
        approx = pm.fit(8000, model=m, random_seed=9, progressbar=False)
        hist = np.asarray(approx.hist)
        # loss must drop substantially from the start to the end
        assert np.nanmean(hist[-500:]) < np.nanmean(hist[:500])


class TestEmpirical:
    def test_empirical_resamples_trace(self):
        m, post_mean, _ = _conjugate_model()
        idata = pm.sample(draws=500, tune=500, chains=2, model=m,
                          random_seed=10, progressbar=False,
                          compute_convergence_checks=False)
        emp = pm.Empirical(idata, model=m)
        redraws = emp.sample(2000, random_seed=11).posterior["mu"].values
        np.testing.assert_allclose(redraws.mean(), post_mean, atol=0.05)


class TestStart:
    def test_start_point_respected(self):
        m, _, _ = _conjugate_model()
        approx = pm.fit(0, model=m, random_seed=12, progressbar=False,
                        start={"mu": 0.7})
        # zero iterations: q mean must sit at the start point
        draws = approx.sample(4000, random_seed=13).posterior["mu"].values
        np.testing.assert_allclose(draws.mean(), 0.7, atol=0.05)
