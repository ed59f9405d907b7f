"""Float32 test leg — the production TPU dtype.

tests/conftest.py forces x64 for scipy-tolerance oracles; everything here
re-runs a representative slice at float32 with `select_by_precision`
tolerances (reference pymc/testing.py:234 and tests/conftest.py:37-49
float32 fixtures): distribution logp contracts, one end-to-end NUTS run,
VI, and the GP jitter discipline (float32 kernel matrices need ~1e-4).
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.testing import (
    Domain,
    Nat,
    R,
    Rplus,
    Rplusbig,
    Unit,
    check_logp,
    select_by_precision,
)


@pytest.fixture(autouse=True)
def f32_mode():
    """Run the module at float32 (the TPU production dtype); restore x64."""
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def test_floatx_follows_mode():
    from pymc_tpu.config import floatX, intX

    assert floatX() == jnp.float32
    assert intX() == jnp.int32
    assert select_by_precision(6, 3) == 3


class TestLogpContractsF32:
    """check_logp picks decimal=3 at f32 via select_by_precision."""

    def test_normal(self):
        check_logp(
            pm.Normal, R, {"mu": R, "sigma": Rplus},
            lambda value, mu, sigma: st.norm.logpdf(value, mu, sigma),
            n_samples=30,
        )

    def test_gamma(self):
        check_logp(
            pm.Gamma, Rplus, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.gamma.logpdf(
                value, alpha, scale=1.0 / beta
            ),
            n_samples=30,
        )

    def test_beta(self):
        check_logp(
            pm.Beta, Unit, {"alpha": Rplusbig, "beta": Rplusbig},
            lambda value, alpha, beta: st.beta.logpdf(value, alpha, beta),
            n_samples=30,
        )

    def test_studentt(self):
        check_logp(
            pm.StudentT, R, {"nu": Rplusbig, "mu": R, "sigma": Rplus},
            lambda value, nu, mu, sigma: st.t.logpdf(value, nu, mu, sigma),
            n_samples=30,
        )

    def test_poisson(self):
        check_logp(
            pm.Poisson, Nat, {"mu": Rplus},
            lambda value, mu: st.poisson.logpmf(value, mu),
            n_samples=30,
        )

    def test_mvnormal(self):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        d = pm.MvNormal.dist(mu=np.array([1.0, -1.0]), cov=cov)
        x = np.array([[0.0, 0.0], [1.0, -1.0], [2.5, 0.5]])
        expected = st.multivariate_normal.logpdf(x, [1.0, -1.0], cov)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), expected, rtol=1e-3, atol=1e-3
        )


class TestEndToEndF32:
    def test_nuts_radon_like(self):
        rng = np.random.default_rng(0)
        g = np.repeat(np.arange(8), 20)
        true_a = rng.normal(0, 0.5, 8)
        y = true_a[g] + rng.normal(0, 1.0, g.size)
        with pm.Model() as m:
            mu_a = pm.Normal("mu_a", 0, 1)
            sigma_a = pm.HalfNormal("sigma_a", 1)
            a = pm.Normal("a", mu_a, sigma_a, shape=(8,))
            sd = pm.HalfNormal("sd", 1)
            pm.Normal("y", a[g], sd, observed=y)
        idata = pm.sample(draws=400, tune=400, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        post = idata.posterior
        assert post["mu_a"].values.dtype == np.float32
        assert abs(float(post["sd"].values.mean()) - 1.0) < 0.2
        rhat = pm.rhat(post["mu_a"].values)
        assert float(np.nanmax(rhat)) < 1.05
        assert float(idata.sample_stats["diverging"].values.mean()) < 0.05

    def test_advi_f32(self):
        rng = np.random.default_rng(1)
        y = rng.normal(2.0, 1.0, 200)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("y", mu, 1.0, observed=y)
        approx = pm.fit(n=10_000, model=m, progressbar=False, random_seed=0)
        assert abs(float(approx.mean["mu"]) - y.mean()) < 0.15

    def test_forward_sampling_dtype(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
            pm.Deterministic("y", 2.0 * x)
        pri = pm.sample_prior_predictive(draws=50, model=m, random_seed=0)
        assert pri.prior["x"].values.dtype == np.float32


class TestGPJitterF32:
    def test_marginal_gp_cholesky_stable(self):
        # float32 kernel matrices need jitter ~1e-4 (1e-6 is float64 lore);
        # gp._stabilize is dtype-aware — this guards that discipline in CI.
        rng = np.random.default_rng(0)
        X = np.linspace(0, 10, 60)[:, None]
        y = np.sin(X[:, 0]) + rng.normal(0, 0.3, 60)
        with pm.Model() as m:
            ell = pm.Gamma("ell", 2, 1)
            eta = pm.HalfNormal("eta", 1)
            cov = eta**2 * pm.gp.cov.ExpQuad(1, ls=ell)
            gp = pm.gp.Marginal(cov_func=cov)
            gp.marginal_likelihood("y", X=X, y=y, sigma=0.3)
            mp = pm.find_MAP(progressbar=False)
        assert np.isfinite(mp["ell"])

    def test_stabilize_jitter_scales_with_dtype(self):
        from pymc_tpu.gp.util import stabilize

        K = jnp.eye(4, dtype=jnp.float32)
        Ks = stabilize(K)
        added = float(Ks[0, 0] - 1.0)
        assert added >= 1e-5  # f32 jitter, not the 1e-6 f64 value

    def test_stabilize_jitter_scales_with_amplitude(self):
        # f32 Cholesky needs cond <~1e6; an absolute jitter is lost on
        # K with diag = eta^2 >> 1 (round-3 latent-GP init fix)
        from pymc_tpu.gp.util import stabilize

        K = 20.0 * jnp.eye(4, dtype=jnp.float32)
        added = float(stabilize(K)[0, 0] - 20.0)
        assert added >= 3e-4 * 20.0 * 0.99

    def test_latent_gp_jittered_init_finite(self):
        # regression: moderate (ls, eta) draws made the 150-point latent-GP
        # kernel indefinite at f32 with absolute jitter — jittered initial
        # points must all have finite logp now
        rng = np.random.default_rng(5)
        n = 150
        X = np.sort(rng.uniform(0, 10, n))[:, None]
        y = np.sin(X[:, 0]) * 2 + rng.normal(0, 0.3, n)
        with pm.Model() as m:
            ls = pm.Gamma("ls", 2, 1)
            eta = pm.HalfNormal("eta", 2)
            cov = eta**2 * pm.gp.cov.ExpQuad(1, ls=ls)
            gp = pm.gp.Latent(cov_func=cov)
            f = gp.prior("f", X=X)
            pm.Normal("y", f, pm.HalfNormal("sigma", 1), observed=y)
        from pymc_tpu.initial_point import make_initial_points_per_chain

        logp = m.logp_fn()
        for seed in range(4):
            pts = make_initial_points_per_chain(
                m, jax.random.PRNGKey(seed), 4, jitter=1.0, logp_fn=logp
            )
            lps = np.asarray(jax.vmap(logp)(pts))
            assert np.isfinite(lps).all(), (seed, lps)


class TestF32StatisticalGate:
    """The production-dtype gate on the flagship config (VERDICT r2 #5):
    radon-style hierarchical GLM sampled at float32 must match the x64
    oracle's posterior moments within MCSE and must not inflate
    divergences."""

    def _radon(self, n_counties=40, n_obs=400, seed=1234):
        rng = np.random.default_rng(seed)
        county = rng.integers(0, n_counties, size=n_obs)
        floor_x = rng.integers(0, 2, size=n_obs).astype(float)
        true_a = rng.normal(1.5, 0.5, size=n_counties)
        true_b = rng.normal(-0.7, 0.3, size=n_counties)
        log_radon = (
            true_a[county] + true_b[county] * floor_x
            + rng.normal(0, 0.6, size=n_obs)
        )
        with pm.Model(coords={"county": np.arange(n_counties)}) as model:
            mu_a = pm.Normal("mu_a", 0.0, 10.0)
            sigma_a = pm.HalfCauchy("sigma_a", 5.0)
            mu_b = pm.Normal("mu_b", 0.0, 10.0)
            sigma_b = pm.HalfCauchy("sigma_b", 5.0)
            a_t = pm.Normal("a_t", 0.0, 1.0, dims="county")
            b_t = pm.Normal("b_t", 0.0, 1.0, dims="county")
            a = pm.Deterministic("a", mu_a + sigma_a * a_t, dims="county")
            b = pm.Deterministic("b", mu_b + sigma_b * b_t, dims="county")
            sigma_y = pm.HalfCauchy("sigma_y", 5.0)
            mu_y = a[county] + b[county] * floor_x
            pm.Normal("y", mu_y, sigma_y, observed=log_radon)
        return model

    def test_radon_f32_within_mcse_of_x64(self):
        from pymc_tpu.stats.convergence import mcse_mean

        kwargs = dict(draws=500, tune=500, chains=8, random_seed=0,
                      progressbar=False, compute_convergence_checks=False)
        idata32 = pm.sample(model=self._radon(), **kwargs)
        assert idata32.posterior["mu_a"].values.dtype == np.float32

        jax.config.update("jax_enable_x64", True)
        try:
            idata64 = pm.sample(model=self._radon(), **kwargs)
        finally:
            jax.config.update("jax_enable_x64", False)

        for var in ("mu_a", "sigma_a", "mu_b", "sigma_b", "sigma_y"):
            v32 = idata32.posterior[var].values
            v64 = idata64.posterior[var].values
            se = float(np.hypot(mcse_mean(v32), mcse_mean(v64)))
            dm = abs(float(v32.mean()) - float(v64.mean()))
            assert dm < 5 * se + 1e-3, (var, dm, se)
            s32, s64 = float(v32.std()), float(v64.std())
            assert abs(s32 - s64) < 0.25 * max(s64, 1e-3), (var, s32, s64)

        div32 = int(idata32.sample_stats["diverging"].values.sum())
        div64 = int(idata64.sample_stats["diverging"].values.sum())
        n_total = int(np.prod(idata32.sample_stats["diverging"].shape))
        assert div32 <= div64 + max(2, n_total // 100), (div32, div64)


class TestF32StressGate:
    """f32 gate on the BASELINE config #3 shape (hierarchical logistic GLM,
    non-centered, Bernoulli likelihood) — scaled to CI size. The bench runs
    this family at 10k params on-device at float32; this gate pins the f32
    posterior to the x64 oracle within MCSE (VERDICT r2 #5)."""

    def _stress(self, n_groups=100, n_obs=1500, seed=7):
        rng = np.random.default_rng(seed)
        g = rng.integers(0, n_groups, n_obs)
        x = rng.normal(size=n_obs)
        true_a = rng.normal(0, 0.5, n_groups)
        true_b = rng.normal(0.3, 0.2, n_groups)
        logits = true_a[g] + true_b[g] * x
        y = (rng.uniform(size=n_obs) < 1 / (1 + np.exp(-logits))).astype(int)
        with pm.Model() as m:
            mu_a = pm.Normal("mu_a", 0, 1)
            sd_a = pm.HalfNormal("sd_a", 1)
            mu_b = pm.Normal("mu_b", 0, 1)
            sd_b = pm.HalfNormal("sd_b", 1)
            a_t = pm.Normal("a_t", 0, 1, shape=(n_groups,))
            b_t = pm.Normal("b_t", 0, 1, shape=(n_groups,))
            a = mu_a + sd_a * a_t
            b = mu_b + sd_b * b_t
            pm.Bernoulli("y", logit_p=a[g] + b[g] * x, observed=y)
        return m

    def test_stress_f32_within_mcse_of_x64(self):
        from pymc_tpu.stats.convergence import mcse_mean

        kwargs = dict(draws=400, tune=400, chains=8, random_seed=0,
                      progressbar=False, compute_convergence_checks=False)
        idata32 = pm.sample(model=self._stress(), **kwargs)
        assert idata32.posterior["mu_a"].values.dtype == np.float32

        jax.config.update("jax_enable_x64", True)
        try:
            idata64 = pm.sample(model=self._stress(), **kwargs)
        finally:
            jax.config.update("jax_enable_x64", False)

        for var in ("mu_a", "sd_a", "mu_b", "sd_b"):
            v32 = idata32.posterior[var].values
            v64 = idata64.posterior[var].values
            se = float(np.hypot(mcse_mean(v32), mcse_mean(v64)))
            dm = abs(float(v32.mean()) - float(v64.mean()))
            assert dm < 5 * se + 1e-3, (var, dm, se)
            s32, s64 = float(v32.std()), float(v64.std())
            assert abs(s32 - s64) < 0.25 * max(s64, 1e-3), (var, s32, s64)

        div32 = int(idata32.sample_stats["diverging"].values.sum())
        div64 = int(idata64.sample_stats["diverging"].values.sum())
        n_total = int(np.prod(idata32.sample_stats["diverging"].shape))
        assert div32 <= div64 + max(2, n_total // 100), (div32, div64)
