"""ABC (likelihood-free) inference with pm.Simulator through sample_smc.

Mirrors reference tests/distributions/test_simulator.py (test_one_gaussian:
mean AND scale recovery + prior/posterior predictive shapes,
test_custom_dist_sum_stat, test_multiple_simulators,
test_simulator_support_point) — the pseudo-likelihood kernels live in
pymc_tpu/distributions/simulator.py (reference simulator.py:63).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pymc_tpu as pm


RNG = np.random.default_rng(20)
DATA = RNG.normal(0.0, 1.0, 1000)


def normal_sim(key, a, b):
    return a + b * jax.random.normal(key, (1000,))


class TestOneGaussian:
    def test_mean_and_scale_recovery_with_predictives(self):
        """Reference test_one_gaussian: both location and scale recovered;
        prior/posterior predictive shapes and moments sane."""
        with pm.Model() as m:
            a = pm.Normal("a", mu=0, sigma=1)
            b = pm.HalfNormal("b", sigma=1)
            s = pm.Simulator(
                "s", normal_sim, a, b, sum_stat="sort", epsilon=1.0,
                observed=DATA,
            )
        idata = pm.sample_smc(
            draws=500, chains=2, model=m, random_seed=3, progressbar=False,
            compute_convergence_checks=False,
        )
        post = idata.posterior
        assert abs(float(post["a"].values.mean()) - DATA.mean()) < 0.05
        assert abs(float(post["b"].values.mean()) - DATA.std()) < 0.05

        prior = pm.sample_prior_predictive(
            draws=200, model=m, random_seed=4
        )
        pp = prior.prior_predictive["s"].values
        assert pp.shape[-1] == 1000
        assert abs(pp.mean()) < 0.2

        post_pred = pm.sample_posterior_predictive(
            idata, model=m, random_seed=5, progressbar=False
        )
        sp = post_pred.posterior_predictive["s"].values
        assert sp.shape[-1] == 1000
        assert abs(sp.mean() - DATA.mean()) < 0.10
        assert abs(sp.std() - DATA.std()) < 0.10


class TestCustomDistanceSumStat:
    def test_custom_callables(self):
        """Reference test_custom_dist_sum_stat: user distance + quantile
        sum_stat."""
        def abs_diff(eps, obs, sim):
            return jnp.mean(-jnp.abs(obs - sim) / eps)

        def quantiles(x):
            return jnp.quantile(x, jnp.array([0.25, 0.5, 0.75]))

        with pm.Model() as m:
            a = pm.Normal("a", mu=0, sigma=1)
            b = pm.HalfNormal("b", sigma=1)
            pm.Simulator(
                "s", normal_sim, a, b, distance=abs_diff,
                sum_stat=quantiles, epsilon=0.5, observed=DATA,
            )
        idata = pm.sample_smc(
            draws=100, chains=1, model=m, random_seed=6, progressbar=False,
            compute_convergence_checks=False,
        )
        assert np.isfinite(idata.posterior["a"].values).all()

    def test_laplace_kernel(self):
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 3)
            pm.Simulator(
                "s", lambda key, mu: mu + jax.random.normal(key, (200,)),
                mu, distance="laplace", sum_stat="sort", epsilon=0.5,
                observed=RNG.normal(1.0, 1.0, 200),
            )
        idata = pm.sample_smc(
            draws=300, chains=2, model=m, random_seed=7, progressbar=False,
            compute_convergence_checks=False,
        )
        assert abs(float(idata.posterior["mu"].values.mean()) - 1.0) < 0.35


class TestMultipleSimulators:
    def test_two_independent_simulators(self):
        """Reference test_multiple_simulators: each pseudo-likelihood
        contributes; both locations recovered."""
        true1, true2 = -2.0, 3.0
        d1 = RNG.normal(true1, 1.0, 300)
        d2 = RNG.normal(true2, 1.0, 300)

        def sim1(key, mu):
            return mu + jax.random.normal(key, (300,))

        def sim2(key, mu):
            return mu + jax.random.normal(key, (300,))

        with pm.Model() as m:
            m1 = pm.Normal("m1", 0, 5)
            m2 = pm.Normal("m2", 0, 5)
            pm.Simulator("s1", sim1, m1, sum_stat="sort", epsilon=0.5,
                         observed=d1)
            pm.Simulator("s2", sim2, m2, sum_stat="sort", epsilon=0.5,
                         observed=d2)
        idata = pm.sample_smc(
            draws=400, chains=2, model=m, random_seed=8, progressbar=False,
            compute_convergence_checks=False,
        )
        assert abs(float(idata.posterior["m1"].values.mean()) - true1) < 0.3
        assert abs(float(idata.posterior["m2"].values.mean()) - true2) < 0.3


class TestSupportPoint:
    @pytest.mark.parametrize("mu, sigma", [(0.0, 1.0), (3.0, 0.5)])
    def test_mean_of_simulations(self, mu, sigma):
        """Reference test_simulator_support_point: the initial value is the
        mean of 10 simulations (data scale, not zeros)."""
        d = pm.Simulator.dist(
            lambda key, m, s: m + s * jax.random.normal(key, (50,)),
            mu, sigma, shape=(50,),
        )
        sp = np.asarray(d.support_point())
        assert sp.shape == (50,)
        assert abs(sp.mean() - mu) < 4.0 * sigma / np.sqrt(10 * 50)


def test_simulator_in_model_initial_point_finite():
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 1)
        pm.Simulator(
            "s", lambda key, mu: mu + jax.random.normal(key, (20,)),
            mu, epsilon=1.0, observed=RNG.normal(0, 1, 20),
        )
    ip = m.initial_point()
    lp = m.compile_logp()(ip)
    assert np.isfinite(float(lp))
