"""MCMC driver depth battery.

Ports the remaining reference tests/sampling/test_mcmc.py inventory:
step-assignment competence matrix, initvals validation, jitter retry
semantics, step-kwargs plumbing (target_accept reaches the sampler stats),
deterministics of imputed RVs in the posterior, empty-model rejection, and
find_MAP not mutating its start dict.
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning, SamplingError


class TestAssignStepMethods:
    """Reference TestAssignStepMethods competence matrix."""

    def _steps(self, model):
        from pymc_tpu.step_methods.compound import (
            CompoundStep,
            assign_step_methods,
        )

        step = assign_step_methods(model)
        return step.methods if isinstance(step, CompoundStep) else [step]

    def test_bernoulli(self):
        from pymc_tpu.step_methods.metropolis import BinaryGibbsMetropolis

        with pm.Model() as model:
            pm.Bernoulli("x", 0.5)
        (step,) = self._steps(model)
        assert isinstance(step, BinaryGibbsMetropolis)

    def test_normal(self):
        from pymc_tpu.step_methods.hmc import NUTS

        with pm.Model() as model:
            pm.Normal("x", 0, 1)
        (step,) = self._steps(model)
        assert isinstance(step, NUTS)

    def test_categorical(self):
        from pymc_tpu.step_methods.metropolis import CategoricalGibbsMetropolis

        with pm.Model() as model:
            pm.Categorical("x", np.array([0.25, 0.70, 0.05]))
        (step,) = self._steps(model)
        assert isinstance(step, CategoricalGibbsMetropolis)

    def test_binomial(self):
        from pymc_tpu.step_methods.metropolis import Metropolis

        with pm.Model() as model:
            pm.Binomial("x", 10, 0.5)
        (step,) = self._steps(model)
        assert isinstance(step, Metropolis)

    def test_mixed_model_compound(self):
        from pymc_tpu.step_methods.hmc import NUTS
        from pymc_tpu.step_methods.metropolis import BinaryGibbsMetropolis

        with pm.Model() as model:
            pm.Normal("mu", 0, 1)
            pm.Bernoulli("z", 0.5)
        steps = self._steps(model)
        kinds = {type(s) for s in steps}
        assert NUTS in kinds and BinaryGibbsMetropolis in kinds


class TestInitvals:
    def test_bad_shape_raises(self):
        with pm.Model() as model:
            pm.Normal("x", 0, 1, shape=(3,))
        with pytest.raises(Exception, match="[sS]hape|broadcast"):
            pm.sample(
                draws=4, tune=4, chains=1, initvals={"x": np.ones(2)},
                progressbar=False, compute_convergence_checks=False,
                model=model,
            )

    def test_good_shape_respected(self):
        with pm.Model() as model:
            pm.Normal("x", 0, 1, shape=(3,))
        idata = pm.sample(
            draws=4, tune=0, chains=1, initvals={"x": np.array([5.0, 5.0, 5.0])},
            init="adapt_diag", progressbar=False,
            compute_convergence_checks=False, random_seed=1, model=model,
        )
        # with zero tuning from a far-out start, early draws stay near it
        assert np.all(np.abs(idata.posterior["x"].values[:, 0]) > 2.0)

    def test_jitter_retries_finds_finite_start(self):
        """A density finite only on a narrow sliver still starts (reference
        _init_jitter retry loop)."""
        with pm.Model() as model:
            pm.Uniform("x", -0.05, 0.05, default_transform=None)
        idata = pm.sample(
            draws=10, tune=10, chains=2, init="jitter+adapt_diag",
            jitter_max_retries=50, progressbar=False,
            compute_convergence_checks=False, random_seed=3, model=model,
        )
        assert np.all(np.abs(idata.posterior["x"].values) <= 0.05)


class TestStepKwargs:
    def test_target_accept_reaches_stats(self):
        with pm.Model() as model:
            pm.Normal("x", 0, 1)
        idata = pm.sample(
            draws=100, tune=200, chains=2, target_accept=0.95,
            progressbar=False, compute_convergence_checks=False,
            random_seed=4, model=model,
        )
        accept = float(np.mean(idata.sample_stats["acceptance_rate"].values))
        assert accept > 0.85

    def test_unknown_sampler_raises(self):
        with pm.Model() as model:
            pm.Normal("x", 0, 1)
        with pytest.raises(Exception):
            pm.sample(draws=4, tune=4, sampler="not_a_sampler",
                      progressbar=False, model=model)


class TestDeterministicOfImputed:
    def test_deterministic_of_unobserved_in_posterior(self):
        """Reference test_deterministic_of_unobserved: a Deterministic of a
        partially-observed RV tracks the imputed values in the posterior."""
        with pm.Model() as model:
            x = pm.HalfNormal("x", 1)
            with pytest.warns(ImputationWarning):
                y = pm.Uniform("y", 0, x, observed=np.array([0.3, 0.5, np.nan]))
            pm.Deterministic("y_plus_one", y + 1)
        idata = pm.sample(
            draws=50, tune=50, chains=1, progressbar=False,
            compute_convergence_checks=False, random_seed=5, model=model,
        )
        post = idata.posterior
        np.testing.assert_allclose(
            post["y_plus_one"].values, post["y"].values + 1, rtol=1e-12
        )
        # observed entries stay fixed; the imputed one varies
        assert np.allclose(post["y"].values[..., 0], 0.3)
        assert np.var(post["y"].values[..., 2]) > 0


def test_empty_model_raises():
    with pm.Model() as model:
        pm.Normal("x", 0, 1, observed=1.0)
    with pytest.raises(Exception, match="free|no .*variables|empty"):
        pm.sample(draws=4, tune=4, progressbar=False, model=model)


def test_find_MAP_does_not_modify_start():
    with pm.Model() as model:
        pm.LogNormal("x", 0, 1)
    start = {"x": 0.5}
    start_copy = dict(start)
    pm.find_MAP(start=start, model=model, progressbar=False)
    assert start == start_copy
