"""Imputation depth battery.

Ports the reference TestImputationMissingData inventory
(tests/model/test_core.py:1578-1925): logp equivalences with fully-observed
models, interval/bounded transforms on the unobserved part, vector
parameters, multivariate imputation — SEPARABLE (whole event rows missing →
independent split, transform kept) and UNSEPARABLE (mask splits event rows →
joint PartialObservedRV logp, transform-free slots) — plus gradient
finiteness through the masked likelihood.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning


def test_missing_logp_gamma_equivalence():
    """Reference test_missing_logp1: partially-observed Gamma logp equals the
    fully-free model's at matching transformed values."""
    with pm.Model() as m1:
        pm.Gamma("x", 1, 1, shape=(4,))
    lp1 = float(m1.compile_logp()({"x_log__": np.zeros(4)}))
    np.testing.assert_allclose(lp1, -4.0, rtol=1e-10)

    with pm.Model() as m2:
        with pytest.warns(ImputationWarning):
            pm.Gamma("x", 1, 1, observed=[1, 1, 1, np.nan])
    lp2 = float(m2.compile_logp()({"x_unobserved_log__": np.zeros(1)}))
    np.testing.assert_allclose(lp2, -4.0, rtol=1e-10)


def test_missing_logp_chained_equivalence():
    """Reference test_missing_logp2: chained observed RVs with complementary
    missing patterns equal the fully-observed model."""
    with pm.Model() as m:
        theta1 = pm.Normal("theta1", 0, 5, observed=np.array([0.0, 1, 2, 3, 4]))
        pm.Normal("theta2", mu=theta1, observed=np.array([0.0, 1, 2, 3, 4]))
    m_logp = float(m.compile_logp()({}))

    with pm.Model() as m_missing:
        with pytest.warns(ImputationWarning):
            theta1 = pm.Normal(
                "theta1", 0, 5, observed=np.array([0, 1, np.nan, 3, np.nan])
            )
        with pytest.warns(ImputationWarning):
            pm.Normal(
                "theta2", mu=theta1,
                observed=np.array([np.nan, np.nan, 2, np.nan, 4]),
            )
    m_missing_logp = float(
        m_missing.compile_logp()(
            {"theta1_unobserved": np.array([2.0, 4.0]),
             "theta2_unobserved": np.array([0.0, 1.0, 3.0])}
        )
    )
    np.testing.assert_allclose(m_logp, m_missing_logp, rtol=1e-10)


def test_missing_vector_parameter():
    """Reference test_missing_vector_parameter: per-column params reach the
    right missing slots."""
    with pm.Model() as m:
        with pytest.warns(ImputationWarning):
            x = pm.Normal(
                "x",
                np.array([-10.0, 10.0]),
                0.1,
                observed=np.array([[np.nan, 10], [-10, np.nan], [np.nan, np.nan]]),
            )
    draws = pm.draw(m["x"], random_seed=1)
    assert draws.shape == (3, 2)
    assert np.all(draws[:, 0] < 0)
    assert np.all(draws[:, 1] > 0)
    lp = float(
        m.compile_logp()({"x_unobserved": np.array([-10.0, 10.0, -10.0, 10.0])})
    )
    np.testing.assert_allclose(lp, st.norm(scale=0.1).logpdf(0) * 6, rtol=1e-10)


def test_missing_symmetric():
    """Reference test_missing_symmetric: equal observed/unobserved sizes must
    not collapse into one term."""
    with pm.Model() as m:
        with pytest.warns(ImputationWarning):
            pm.Gamma("x", alpha=3, beta=10, observed=np.array([1, np.nan]))
    lp = float(
        m.compile_logp()({"x_unobserved_log__": np.array([np.log(2.0)])})
    )
    expected = (
        st.gamma.logpdf(1.0, 3, scale=0.1)
        + st.gamma.logpdf(2.0, 3, scale=0.1)
        + np.log(2.0)  # log-jacobian of the log transform
    )
    np.testing.assert_allclose(lp, expected, rtol=1e-8)


def test_interval_missing_observations():
    """Reference test_interval_missing_observations: the unobserved part of a
    bounded dist keeps the interval transform; combined draws join the
    resampled observed and unobserved parts."""
    obs1 = np.array([1.0, 2, np.nan, 4, np.nan])
    with pm.Model() as model:
        with pytest.warns(ImputationWarning):
            theta1 = pm.Uniform("theta1", 0, 5, observed=obs1)
        with pytest.warns(ImputationWarning):
            pm.Normal("theta2", mu=theta1,
                      observed=np.array([np.nan, np.nan, 6, np.nan, 8.0]))

    ip = model.initial_point()
    assert "theta1_unobserved_interval__" in ip
    assert "theta2_unobserved" in ip

    idata = pm.sample_prior_predictive(draws=50, model=model, random_seed=9)
    pri = {
        k: np.asarray(v.values[0]) for k, v in
        list(idata.prior.items()) + list(idata.prior_predictive.items())
    }
    assert {"theta1", "theta1_unobserved", "theta2", "theta2_unobserved"} <= set(pri)
    assert pri["theta1"].shape[-1] == obs1.shape[0]
    # observed part is RESAMPLED in prior predictive (not the data)
    obs_part = pri["theta1"][:, ~np.isnan(obs1)]
    assert np.all(np.var(obs_part, 0) > 0.0)
    # missing part of the combined vector equals the unobserved draws
    np.testing.assert_allclose(
        pri["theta1"][:, np.isnan(obs1)], pri["theta1_unobserved"]
    )
    # bounded support respected everywhere
    assert np.all(pri["theta1"] >= 0) and np.all(pri["theta1"] <= 5)


def test_missing_with_predictors_and_start():
    predictors = np.array([0.5, 1, 0.5, 2, 0.3])
    data = np.array([1.0, 2, np.nan, 4, np.nan])
    with pm.Model() as model:
        x = pm.Normal("x", 1, 1)
        with pytest.warns(ImputationWarning):
            pm.Normal("y", x * predictors, 1, observed=data)
    assert "y_unobserved" in model.named_vars
    lp = model.compile_logp()(model.initial_point())
    assert np.isfinite(float(lp))
    idata = pm.sample_prior_predictive(draws=10, model=model, random_seed=3)
    assert "x" in idata.prior
    assert "y" in idata.prior_predictive or "y" in idata.prior


def test_missing_dual_observations_sampling():
    with pm.Model() as model:
        obs1 = np.array([1.0, 2, np.nan, 4, np.nan])
        obs2 = np.array([np.nan, np.nan, 6, np.nan, 8.0])
        beta1 = pm.Normal("beta1", 1, 1)
        beta2 = pm.Normal("beta2", 2, 1)
        latent = pm.Normal("theta", size=5)
        with pytest.warns(ImputationWarning):
            pm.Normal("o1", mu=beta1 * latent, observed=obs1)
        with pytest.warns(ImputationWarning):
            pm.Normal("o2", mu=beta2 * latent, observed=obs2)
        idata = pm.sample(chains=1, tune=30, draws=30, progressbar=False,
                          random_seed=14, compute_convergence_checks=False)
    post = idata.posterior
    assert {"beta1", "beta2", "theta", "o1_unobserved", "o2_unobserved"} <= set(
        post.data_vars
    )


class TestMultivariateImputation:
    def test_separable_dirichlet(self):
        """Reference test_missing_multivariate_separable: fully-missing rows
        split into an independent RV that KEEPS the simplex transform."""
        with pm.Model() as m_miss:
            with pytest.warns(ImputationWarning):
                pm.Dirichlet(
                    "x", a=np.array([1.0, 2, 3]),
                    observed=np.array([[0.3, 0.3, 0.4],
                                       [np.nan, np.nan, np.nan]]),
                )
        ip = m_miss.initial_point()
        assert "x_unobserved_simplex__" in ip

        with pm.Model() as m_unobs:
            pm.Dirichlet("x", a=np.array([1.0, 2, 3]), shape=(1, 3))

        from pymc_tpu.distributions.transforms import SimplexTransform

        inp = np.asarray(
            SimplexTransform().forward(np.array([[0.3, 0.3, 0.4]]))
        )
        lp_miss = float(
            m_miss.compile_logp(jacobian=False)({"x_unobserved_simplex__": inp})
        )
        lp_unobs = float(
            m_unobs.compile_logp(jacobian=False)({"x_simplex__": inp})
        )
        np.testing.assert_allclose(lp_miss, lp_unobs * 2, rtol=1e-8)

    def test_unseparable_dirichlet(self):
        """Reference test_missing_multivariate_unseparable: mask splits event
        rows — transform-free slots, joint logp."""
        with pm.Model() as m_miss:
            with pytest.warns(ImputationWarning):
                pm.Dirichlet(
                    "x", a=np.array([1.0, 2, 3]),
                    observed=np.array([[0.3, 0.3, np.nan],
                                       [np.nan, np.nan, 0.4]]),
                )
        ip = m_miss.initial_point()
        assert "x_unobserved" in ip  # NO transform on the slots
        lp = float(
            m_miss.compile_logp()({"x_unobserved": np.array([0.4, 0.3, 0.3])})
        )
        expected = st.dirichlet.logpdf([0.3, 0.3, 0.4], [1, 2, 3]) * 2
        np.testing.assert_allclose(lp, expected, rtol=1e-8)

    def test_unseparable_mvnormal_coordinates(self):
        """Reference test_coordinates (issue #7304 shape regression)."""
        coords = {"trial": range(30), "feature": range(2)}
        observed = np.zeros((30, 2))
        observed[0, 0] = np.nan
        with pm.Model(coords=coords) as model:
            with pytest.warns(ImputationWarning):
                pm.MvNormal(
                    "y", mu=np.zeros(2), cov=np.eye(2), observed=observed,
                    dims=("trial", "feature"),
                )
        lp = float(model.compile_logp()({"y_unobserved": np.array([0.0])}))
        expected = st.multivariate_normal.logpdf([0, 0], cov=np.eye(2)) * 30
        np.testing.assert_allclose(lp, expected, rtol=1e-8)
        # gradient through the joint-scatter logp stays finite
        fn = model.logp_dlogp_fn()
        val, grad = fn(np.array([0.5]))
        assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))

    def test_separable_mvnormal_batched_mu(self):
        mu = np.array([[0.0, 0.0], [5.0, 5.0], [-5.0, -5.0]])
        observed = np.array([[0.1, -0.1],
                             [np.nan, np.nan],
                             [np.nan, np.nan]])
        with pm.Model() as m:
            with pytest.warns(ImputationWarning):
                pm.MvNormal("y", mu=mu, cov=np.eye(2), observed=observed)
        # unobserved rows get their OWN mu rows
        draws = pm.draw(m["y_unobserved"], random_seed=5)
        assert draws.shape == (2, 2)
        lp = float(m.compile_logp()({"y_unobserved": mu[1:]}))
        expected = (
            st.multivariate_normal.logpdf([0.1, -0.1], mu[0], np.eye(2))
            + 2 * st.multivariate_normal.logpdf([0, 0], [0, 0], np.eye(2))
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-8)

    def test_dims_not_propagated_to_subcomponents(self):
        data = np.array([np.nan] * 3 + [0.0] * 7)
        with pm.Model(coords={"observed": range(10)}) as model:
            with pytest.warns(ImputationWarning):
                pm.Normal("x", observed=data, dims=("observed",))
        assert model.named_vars_to_dims.get("x") == ("observed",)
        assert "x_unobserved" not in model.named_vars_to_dims or \
            model.named_vars_to_dims.get("x_unobserved") is None


def test_symbolic_random_variable_censored():
    """Reference test_symbolic_random_variable: imputation through a derived
    (Censored) distribution."""
    data = np.array([np.nan] * 3 + [0.0] * 7)
    with pm.Model() as model:
        with pytest.warns(ImputationWarning):
            pm.Censored("x", pm.Normal.dist(), lower=0, upper=10, observed=data)
    lp = float(model.compile_logp()({"x_unobserved": np.zeros(3)}))
    np.testing.assert_allclose(lp, st.norm.logcdf(0) * 10, rtol=1e-8)


def test_truncated_normal_imputation_start_vals():
    """Reference test_truncated_normal (#6999): finite start logp."""
    with pm.Model() as m:
        mu = pm.TruncatedNormal("mu", mu=1, sigma=2, lower=0)
        with pytest.warns(ImputationWarning):
            pm.TruncatedNormal(
                "x", mu=mu, sigma=0.5, lower=0,
                observed=np.array([0.1, 0.2, 0.5, np.nan, np.nan]),
            )
    m.check_start_vals(m.initial_point())


def test_imputed_model_grad_finite_sweep():
    """Masked-likelihood gradients stay finite (the zero-fill × -inf logp
    where-VJP trap)."""
    specs = [
        (pm.Gamma, {"alpha": 2.0, "beta": 1.0}, [1.0, np.nan, 2.0]),
        (pm.Beta, {"alpha": 2.0, "beta": 2.0}, [0.3, np.nan, 0.6]),
        (pm.Exponential, {"lam": 1.0}, [1.0, np.nan, 0.5]),
        (pm.LogNormal, {"mu": 0.0, "sigma": 1.0}, [1.0, np.nan, 2.0]),
    ]
    for cls, kwargs, data in specs:
        with pm.Model() as m:
            hyper = pm.Normal("h", 1.0, 0.5)
            kw = dict(kwargs)
            first = next(iter(kw))
            kw[first] = abs(hyper) + 0.5
            with pytest.warns(ImputationWarning):
                cls("x", observed=np.array(data), **kw)
        fn = m.logp_dlogp_fn()
        q = np.array(
            [0.3] + [0.1] * (len(m.continuous_value_vars) - 1), dtype=float
        )
        val, grad = fn(q)
        assert np.isfinite(float(val)), cls.__name__
        assert np.all(np.isfinite(np.asarray(grad))), cls.__name__
