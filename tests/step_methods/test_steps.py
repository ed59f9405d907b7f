"""Step-method tests (mirrors reference tests/step_methods/: statistical
checks on known posteriors + competence assignment)."""

import numpy as np
import pytest

import pymc_tpu as pm


def _normal_model():
    with pm.Model() as m:
        pm.Normal("x", 1.0, 2.0)
    return m


class TestMetropolis:
    def test_normal_posterior(self):
        m = _normal_model()
        idata = pm.sample(draws=2000, tune=1000, chains=4, model=m,
                          step=pm.Metropolis(model=m), random_seed=1,
                          progressbar=False, compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert abs(x.mean() - 1.0) < 0.15
        assert abs(x.std() - 2.0) < 0.2

    def test_transformed_var(self):
        y = np.random.default_rng(0).normal(0, 1.5, 200)
        with pm.Model() as m:
            s = pm.HalfNormal("s", 5)
            pm.Normal("y", 0, s, observed=y)
        idata = pm.sample(draws=2000, tune=1000, chains=2, model=m,
                          step=pm.Metropolis(model=m), random_seed=2,
                          progressbar=False, compute_convergence_checks=False)
        assert abs(idata.posterior["s"].values.mean() - 1.5) < 0.2


class TestSlice:
    def test_normal_posterior(self):
        m = _normal_model()
        idata = pm.sample(draws=1000, tune=500, chains=2, model=m,
                          step=pm.Slice(model=m), random_seed=3,
                          progressbar=False, compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert abs(x.mean() - 1.0) < 0.15
        assert abs(x.std() - 2.0) < 0.15


class TestDEMetropolisZ:
    def test_mvnormal_posterior(self):
        with pm.Model() as m:
            pm.Normal("x", 0.0, 1.0, shape=(3,))
        idata = pm.sample(draws=3000, tune=1500, chains=2, model=m,
                          step=pm.DEMetropolisZ(model=m), random_seed=4,
                          progressbar=False, compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert np.all(np.abs(x.mean(axis=(0, 1))) < 0.2)
        assert np.all(np.abs(x.std(axis=(0, 1)) - 1.0) < 0.2)


class TestDEMetropolis:
    def test_population_sampling(self):
        with pm.Model() as m:
            pm.Normal("x", 2.0, 1.0)
        idata = pm.sample(draws=1500, tune=1000, chains=8, model=m,
                          step=pm.DEMetropolis(model=m), random_seed=5,
                          progressbar=False, compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert abs(x.mean() - 2.0) < 0.15


class TestDiscreteSampling:
    def test_bernoulli_gibbs(self):
        # posterior of p(z=1) with known likelihoods
        with pm.Model() as m:
            z = pm.Bernoulli("z", 0.3)
        idata = pm.sample(draws=3000, tune=500, chains=2, model=m,
                          random_seed=6, progressbar=False,
                          compute_convergence_checks=False)
        z = idata.posterior["z"].values
        assert abs(z.mean() - 0.3) < 0.05

    def test_binomial_metropolis(self):
        with pm.Model() as m:
            k = pm.Binomial("k", 20, 0.4)
        idata = pm.sample(draws=4000, tune=1000, chains=2, model=m,
                          random_seed=7, progressbar=False,
                          compute_convergence_checks=False)
        k = idata.posterior["k"].values
        assert abs(k.mean() - 8.0) < 0.5

    def test_categorical_gibbs(self):
        p = np.array([0.1, 0.2, 0.7])
        with pm.Model() as m:
            c = pm.Categorical("c", p=p)
        idata = pm.sample(draws=4000, tune=500, chains=2, model=m,
                          random_seed=8, progressbar=False,
                          compute_convergence_checks=False)
        c = idata.posterior["c"].values
        freqs = np.bincount(c.ravel(), minlength=3) / c.size
        np.testing.assert_allclose(freqs, p, atol=0.05)

    def test_mixed_compound(self):
        # continuous + discrete => NUTS + Gibbs compound, correct joint
        rng = np.random.default_rng(9)
        y = rng.normal(3.0, 1.0, 60)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            z = pm.Bernoulli("z", 0.5)
            pm.Normal("y", mu + 2.0 * z, 1.0, observed=y)
        idata = pm.sample(draws=1500, tune=1000, chains=2, model=m,
                          random_seed=10, progressbar=False,
                          compute_convergence_checks=False)
        mu_est = idata.posterior["mu"].values.mean()
        z_mean = idata.posterior["z"].values.mean()
        # posterior concentrates on mu ~= 3 - 2 * E[z]
        assert abs(mu_est + 2.0 * z_mean - 3.0) < 0.3


class TestHamiltonianMC:
    def test_normal_posterior(self):
        m = _normal_model()
        idata = pm.sample(draws=1000, tune=1000, chains=2, model=m,
                          step=pm.HamiltonianMC(model=m), random_seed=11,
                          progressbar=False, compute_convergence_checks=False)
        x = idata.posterior["x"].values
        assert abs(x.mean() - 1.0) < 0.2
        assert abs(x.std() - 2.0) < 0.25


class TestAssignment:
    def test_continuous_gets_nuts(self):
        from pymc_tpu.step_methods import NUTS, assign_step_methods

        with pm.Model() as m:
            pm.Normal("x", 0, 1)
            pm.Gamma("g", 2, 1)
        s = assign_step_methods(m)
        assert isinstance(s, NUTS)

    def test_mixed_gets_compound(self):
        from pymc_tpu.step_methods import (
            BinaryGibbsMetropolis,
            CompoundStep,
            NUTS,
            assign_step_methods,
        )

        with pm.Model() as m:
            pm.Normal("x", 0, 1)
            pm.Bernoulli("z", 0.5)
        s = assign_step_methods(m)
        assert isinstance(s, CompoundStep)
        kinds = {type(x) for x in s.methods}
        assert NUTS in kinds and BinaryGibbsMetropolis in kinds
