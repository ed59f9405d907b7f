"""GP module + find_MAP tests (mirrors reference tests/gp/test_gp.py,
test_cov.py, test_hsgp_approx.py, tests/tuning/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.gp import cov as gpc


class TestCov:
    def test_expquad_matches_manual(self):
        X = np.random.default_rng(0).normal(size=(10, 2))
        K = np.asarray(gpc.ExpQuad(2, ls=1.5).full(X))
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(K, np.exp(-0.5 * d2 / 1.5**2), rtol=1e-7)

    def test_matern52(self):
        X = np.linspace(0, 5, 8)[:, None]
        K = np.asarray(gpc.Matern52(1, ls=2.0).full(X))
        r = np.abs(X - X.T) / 2.0
        expected = (1 + np.sqrt(5) * r + 5 / 3 * r**2) * np.exp(-np.sqrt(5) * r)
        np.testing.assert_allclose(K, expected, rtol=1e-5, atol=1e-7)

    def test_algebra(self):
        X = np.linspace(0, 1, 5)[:, None]
        k1 = gpc.ExpQuad(1, ls=1.0)
        k2 = gpc.Matern32(1, ls=0.5)
        K = np.asarray((2.0 * k1 + k2 * k1).full(X))
        expected = 2 * np.asarray(k1.full(X)) + np.asarray(
            k2.full(X)
        ) * np.asarray(k1.full(X))
        np.testing.assert_allclose(K, expected, rtol=1e-7)

    def test_periodic_and_linear(self):
        X = np.linspace(0, 3, 6)[:, None]
        Kp = np.asarray(gpc.Periodic(1, period=1.0, ls=0.7).full(X))
        expected = np.exp(
            -0.5 * np.sin(np.pi * np.abs(X - X.T) / 1.0) ** 2 / 0.7**2
        )
        np.testing.assert_allclose(Kp, expected, rtol=1e-6)
        # the reference's own oracle (tests/gp/test_cov.py:665)
        Xr = np.linspace(0, 1, 10)[:, None]
        Kr = np.asarray(gpc.Periodic(1, period=0.1, ls=0.1).full(Xr))
        np.testing.assert_allclose(Kr[0, 1], 0.00288, atol=1e-3)
        Kl = np.asarray(gpc.Linear(1, c=0.5).full(X))
        np.testing.assert_allclose(Kl, (X - 0.5) @ (X - 0.5).T, rtol=1e-6)

    def test_whitenoise_and_symbolic_params(self):
        X = np.linspace(0, 1, 4)[:, None]
        Kw = np.asarray(gpc.WhiteNoise(0.5).full(X))
        np.testing.assert_allclose(Kw, 0.25 * np.eye(4), rtol=1e-7)
        # symbolic lengthscale through a model
        with pm.Model() as m:
            ls = pm.HalfNormal("ls", 1.0)
            K = gpc.ExpQuad(1, ls=ls).full(X)
            assert hasattr(K, "eval")
            val = K.eval(point={"ls": 2.0})
        d2 = (X - X.T) ** 2
        np.testing.assert_allclose(np.asarray(val), np.exp(-0.5 * d2 / 4.0),
                                   rtol=1e-6)


class TestLatentMarginal:
    def _data(self):
        rng = np.random.default_rng(1)
        X = np.linspace(0, 10, 60)[:, None]
        f_true = np.sin(X[:, 0] * 0.8)
        y = f_true + rng.normal(0, 0.2, 60)
        return X, f_true, y

    def test_marginal_recovers_function(self):
        X, f_true, y = self._data()
        with pm.Model() as m:
            ls = pm.Gamma("ls", 4, 2)
            eta = pm.HalfNormal("eta", 2)
            gp = pm.gp.Marginal(cov_func=eta**2 * gpc.ExpQuad(1, ls=ls))
            gp.marginal_likelihood("y", X=X, y=y, sigma=0.2)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m, random_seed=2,
                          progressbar=False, compute_convergence_checks=False)
        ls_est = idata.posterior["ls"].values.mean()
        assert 0.5 < ls_est < 4.0
        # predict at MAP-ish point
        pt = {"ls": ls_est, "eta": idata.posterior["eta"].values.mean()}
        mu, var = gp.predict(X, point=pt, diag=True)
        assert np.corrcoef(mu, f_true)[0, 1] > 0.95

    def test_latent_prior_and_conditional(self):
        X, f_true, y = self._data()
        with pm.Model() as m:
            gp = pm.gp.Latent(cov_func=gpc.ExpQuad(1, ls=1.5))
            f = gp.prior("f", X=X)
            pm.Normal("y", f, 0.2, observed=y)
        idata = pm.sample(draws=200, tune=300, chains=2, model=m, random_seed=3,
                          progressbar=False, compute_convergence_checks=False)
        f_est = idata.posterior["f"].values.mean(axis=(0, 1))
        assert np.corrcoef(f_est, f_true)[0, 1] > 0.9

    def test_marginal_approx_close_to_exact(self):
        X, f_true, y = self._data()
        Xu = np.linspace(0, 10, 15)[:, None]
        with pm.Model() as m:
            gp = pm.gp.MarginalApprox(approx="VFE",
                                      cov_func=gpc.ExpQuad(1, ls=1.5))
            gp.marginal_likelihood("lik", X=X, Xu=Xu, y=y, sigma=0.2)
        lp_approx = float(m.compile_logp()(m.initial_point()))
        with pm.Model() as m2:
            gp2 = pm.gp.Marginal(cov_func=gpc.ExpQuad(1, ls=1.5))
            gp2.marginal_likelihood("y", X=X, y=y, sigma=0.2)
        lp_exact = float(m2.compile_logp()(m2.initial_point()))
        assert abs(lp_approx - lp_exact) < 0.1 * abs(lp_exact)


class TestHSGP:
    def test_hsgp_covariance_matches_kernel(self):
        # HSGP basis reproduces the ExpQuad kernel inside the domain
        X = np.linspace(-1.2, 1.2, 40)[:, None]
        cov = gpc.ExpQuad(1, ls=0.4)
        hs = pm.gp.HSGP(m=[60], c=2.0, cov_func=cov)
        phi, sqrt_psd = hs.prior_linearized(X)
        phi = np.asarray(phi)
        psd = np.asarray(sqrt_psd) ** 2
        K_approx = (phi * psd) @ phi.T
        K_exact = np.asarray(cov.full(X))
        np.testing.assert_allclose(K_approx, K_exact, atol=0.02)

    def test_hsgp_matern52_covariance(self):
        X = np.linspace(-1, 1, 30)[:, None]
        cov = gpc.Matern52(1, ls=0.5)
        hs = pm.gp.HSGP(m=[80], c=2.5, cov_func=cov)
        phi, sqrt_psd = hs.prior_linearized(X)
        K_approx = (np.asarray(phi) * np.asarray(sqrt_psd) ** 2) @ np.asarray(
            phi
        ).T
        np.testing.assert_allclose(K_approx, np.asarray(cov.full(X)), atol=0.03)

    def test_hsgp_regression(self):
        rng = np.random.default_rng(4)
        X = np.linspace(0, 10, 100)[:, None]
        f_true = np.sin(0.7 * X[:, 0])
        y = f_true + rng.normal(0, 0.2, 100)
        with pm.Model() as m:
            eta = pm.HalfNormal("eta", 2)
            gp = pm.gp.HSGP(m=[30], c=1.5,
                            cov_func=eta**2 * gpc.Matern52(1, ls=1.5))
            f = gp.prior("f", X=X)
            pm.Normal("y", f, 0.2, observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m, random_seed=5,
                          progressbar=False, compute_convergence_checks=False)
        f_est = idata.posterior["f"].values.mean(axis=(0, 1))
        assert np.corrcoef(f_est, f_true)[0, 1] > 0.95


class TestKron:
    def test_marginal_kron(self):
        rng = np.random.default_rng(6)
        X1 = np.linspace(0, 1, 5)[:, None]
        X2 = np.linspace(0, 1, 4)[:, None]
        y = rng.normal(size=20)
        with pm.Model() as m:
            gp = pm.gp.MarginalKron(
                cov_funcs=[gpc.ExpQuad(1, ls=0.5), gpc.Matern32(1, ls=0.5)]
            )
            gp.marginal_likelihood("y", Xs=[X1, X2], y=y, sigma=0.3)
        lp = float(m.compile_logp()(m.initial_point()))
        # dense check
        K = np.kron(
            np.asarray(gpc.ExpQuad(1, ls=0.5).full(X1)),
            np.asarray(gpc.Matern32(1, ls=0.5).full(X2)),
        ) + 0.09 * np.eye(20)
        expected = st.multivariate_normal.logpdf(y, np.zeros(20), K)
        np.testing.assert_allclose(lp, expected, rtol=1e-5)


class TestFindMAP:
    def test_conjugate_map(self):
        y = np.random.default_rng(7).normal(1.5, 1.0, 50)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("y", mu, 1.0, observed=y)
        map_est = pm.find_MAP(model=m, progressbar=False)
        n = len(y)
        exact = y.sum() / (n + 0.01)
        np.testing.assert_allclose(map_est["mu"], exact, rtol=1e-4)

    def test_transformed_map(self):
        y = np.random.default_rng(8).normal(0, 2.0, 200)
        with pm.Model() as m:
            s = pm.HalfNormal("s", 10)
            pm.Normal("y", 0, s, observed=y)
        map_est = pm.find_MAP(model=m, progressbar=False)
        assert abs(map_est["s"] - y.std()) < 0.1
        assert "s_log__" in map_est

    def test_find_hessian(self):
        y = np.random.default_rng(9).normal(0.0, 1.0, 100)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 100)
            pm.Normal("y", mu, 1.0, observed=y)
        H = pm.find_hessian({"mu": np.array(0.0)}, model=m)
        np.testing.assert_allclose(H[0, 0], 100 + 1e-4, rtol=1e-3)
