"""TP (Student-T process) and LatentKron structural correctness
(reference tests/gp/test_gp.py TestTP / TestLatentKron roles)."""

import numpy as np
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.graph import evaluate


class TestLatentKronExactCovariance:
    def test_implied_covariance_is_kron(self):
        # f = (chol(K1) (x) chol(K2)) v  =>  Cov[f] = K1 (x) K2: extract the
        # implied linear map column-by-column and check M M^T exactly
        X1 = np.linspace(0, 1, 3)[:, None]
        X2 = np.linspace(0, 2, 4)[:, None]
        k1 = pm.gp.cov.ExpQuad(1, 0.5)
        k2 = pm.gp.cov.Matern32(1, 0.8)
        with pm.Model() as m:
            gp = pm.gp.LatentKron(cov_funcs=[k1, k2])
            gp.prior("f", Xs=[X1, X2])
        N = 12
        M = np.zeros((N, N))
        for i in range(N):
            e = np.zeros(N)
            e[i] = 1.0
            M[:, i] = np.asarray(evaluate(m["f"], {"f_rotated_": jnp.asarray(e)}))
        K = np.kron(np.asarray(k1.full(X1)), np.asarray(k2.full(X2)))
        np.testing.assert_allclose(M @ M.T, K, atol=5e-5)


class TestTPPrior:
    def test_marginal_moments_and_tails(self):
        # TP(nu) prior at any single input is marginally StudentT(nu):
        # Var = nu/(nu-2) * K_ii; excess kurtosis > 0 (heavier than the GP)
        nu = 5.0
        X = np.linspace(0, 1, 3)[:, None]
        k = pm.gp.cov.ExpQuad(1, 0.5)
        with pm.Model() as m:
            gp = pm.gp.TP(cov_func=k, nu=nu)
            gp.prior("f", X=X)
        idata = pm.sample_prior_predictive(draws=20_000, model=m,
                                           random_seed=0)
        f = np.asarray(idata.prior["f"]).reshape(-1, 3)
        target_var = nu / (nu - 2.0)  # K_ii = 1 for ExpQuad
        np.testing.assert_allclose(f.var(axis=0), target_var, rtol=0.1)
        np.testing.assert_allclose(f.mean(axis=0), 0.0, atol=0.05)
        # StudentT(5) excess kurtosis = 6/(nu-4) = 6 — allow a wide band but
        # clearly super-Gaussian
        from scipy.stats import kurtosis

        assert np.all(kurtosis(f, axis=0) > 1.0)

    def test_requires_nu(self):
        import pytest

        with pytest.raises(ValueError, match="nu"):
            pm.gp.TP(cov_func=pm.gp.cov.ExpQuad(1, 1.0))
