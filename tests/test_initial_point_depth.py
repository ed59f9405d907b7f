"""Initial-point + find_MAP depth battery.

Ports the case inventories of reference tests/test_initial_point.py
(dependent initvals:52, symbolic initval rejection:74, nested prior
chains:84, seeding:121, untransformed point:133, jitter:143, overrides:164,
string overrides:184) and tests/tuning/test_starting.py (mle_jacobian:32,
accuracy:50, find_MAP bounded:94, var-order/start:118, imputed 4488:144,
gradient-free method:88) with this project's own oracles.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning


class TestInitvalEvaluation:
    def test_dependent_initvals(self):
        with pm.Model() as pmodel:
            L = pm.Uniform("L", 0, 1, initval=0.5)
            U = pm.Uniform("U", lower=9, upper=10, initval=9.5)
            pm.Uniform("B1", lower=L, upper=U, initval=5.0)
            pm.Uniform("B2", lower=L, upper=U, initval=(0.5 + 9.5) / 2)

            ip = pmodel.initial_point(random_seed=0)
            assert_allclose(np.asarray(ip["L_interval__"]), 0, atol=1e-6)
            assert_allclose(np.asarray(ip["U_interval__"]), 0, atol=1e-6)
            assert_allclose(np.asarray(ip["B1_interval__"]), 0, atol=1e-6)
            assert_allclose(np.asarray(ip["B2_interval__"]), 0, atol=1e-6)

            # moving U's initval moves the dependent midpoints off-center
            pmodel.set_initval("U", 9.9)
            ip = pmodel.initial_point(random_seed=0)
            assert float(ip["B1_interval__"]) < 0
            assert float(ip["B2_interval__"]) < 0

    def test_symbolic_initval_not_supported(self):
        with pm.Model() as pmodel:
            L = pm.Uniform("L", 0, 1, initval=0.5)
            pm.Uniform("U", lower=L, upper=1.5, initval=L * 2)
            with pytest.raises(ValueError, match="depends on other random"):
                pmodel.initial_point(random_seed=0)

    def test_nested_prior_initvals_chain(self):
        """reference test_nested_initvals (issue #5168): 'prior' initvals
        evaluate in dependency order, so tiny-sigma LogNormal chains give
        the multiplicative ladder 1,2,4,..."""
        with pm.Model() as pmodel:
            one = pm.LogNormal("one", mu=np.log(1), sigma=1e-5,
                               initval="prior")
            two = pm.LogNormal("two", mu=pm.math.log(one * 2), sigma=1e-5,
                               initval="prior")
            three = pm.LogNormal("three", mu=pm.math.log(two * 2),
                                 sigma=1e-5, initval="prior")
            four = pm.LogNormal("four", mu=pm.math.log(three * 2),
                                sigma=1e-5, initval="prior")

        ip = pmodel.initial_point(random_seed=0)
        vals = [np.exp(float(ip[f"{n}_log__"]))
                for n in ["one", "two", "three", "four"]]
        assert_allclose(vals, [1, 2, 4, 8], rtol=1e-3)

        # overriding a middle link restarts the ladder
        pmodel.set_initval("three", 1.0)
        ip = pmodel.initial_point(random_seed=0)
        vals = [np.exp(float(ip[f"{n}_log__"]))
                for n in ["one", "two", "three", "four"]]
        assert_allclose(vals, [1, 2, 1, 2], rtol=1e-3)

    def test_seeding(self):
        with pm.Model() as pmodel:
            pm.Normal("A", initval="prior")
            pm.Uniform("B", initval="prior")
            pm.Normal("C", initval="support_point")
        ip1 = pmodel.initial_point(random_seed=42)
        ip2 = pmodel.initial_point(random_seed=42)
        ip3 = pmodel.initial_point(random_seed=15)
        for k in ip1:
            assert_allclose(np.asarray(ip1[k]), np.asarray(ip2[k]))
        assert any(
            not np.allclose(np.asarray(ip1[k]), np.asarray(ip3[k]))
            for k in ("A", "B_interval__")
        )

    def test_moment_alias(self):
        """'moment' is the deprecated alias of 'support_point'."""
        with pm.Model() as m:
            pm.Gamma("g", 2.0, 1.0, initval="moment")
        ip = m.initial_point(random_seed=0)
        with pm.Model() as m2:
            pm.Gamma("g", 2.0, 1.0, initval="support_point")
        ip2 = m2.initial_point(random_seed=0)
        assert_allclose(np.asarray(ip["g_log__"]), np.asarray(ip2["g_log__"]))

    def test_untransformed_point_via_constrain(self):
        """reference return_transformed=False: constrain() maps the value
        point back to rv space."""
        with pm.Model() as m:
            pm.LogNormal("x", mu=0.0, sigma=1.0, initval=5.0)
        ip = m.initial_point(random_seed=0)
        assert_allclose(float(ip["x_log__"]), np.log(5.0), rtol=1e-6)
        con = m.constrain(ip)
        assert_allclose(float(con["x"]), 5.0, rtol=1e-6)

    def test_adds_jitter_in_transformed_space(self):
        with pm.Model() as m:
            pm.LogNormal("x", initval=1.0)
        base = m.initial_point(random_seed=0)
        jit = m.initial_point(random_seed=0, jitter=1.0)
        assert_allclose(float(base["x_log__"]), 0.0, atol=1e-7)
        v = float(jit["x_log__"])
        assert v != 0.0 and abs(v) <= 1.0

    def test_string_overrides_work(self):
        """reference test_string_overrides_work: overrides passed at call
        time beat the registered strategies."""
        from pymc_tpu.initial_point import make_initial_point
        import jax

        with pm.Model() as m:
            pm.Normal("x", mu=3.0, initval=2.0)
        ip = make_initial_point(m, jax.random.PRNGKey(0),
                                overrides={"x": "support_point"})
        assert_allclose(float(ip["x"]), 3.0, atol=1e-7)
        ip = make_initial_point(m, jax.random.PRNGKey(0),
                                overrides={"x": 7.0})
        assert_allclose(float(ip["x"]), 7.0, atol=1e-7)


class TestFindMAP:
    def test_mle_jacobian_bounded_matches_unbounded(self):
        """reference test_mle_jacobian: with a flat(ish) prior, the MAP of a
        BOUNDED mu equals the unbounded MLE — the jacobian term must not
        shift bounded-variable modes."""
        rng = np.random.default_rng(4)
        truth = 10.0
        data = rng.normal(truth, 1.0, size=100)
        with pm.Model():
            mu = pm.Uniform("mu_i", -1e3, 1e3)
            pm.Normal("y", mu, 1.0, observed=data)
            est_bounded = pm.find_MAP(progressbar=False)
        with pm.Model():
            mu = pm.Flat("mu_i")
            pm.Normal("y", mu, 1.0, observed=data)
            est_flat = pm.find_MAP(progressbar=False)
        assert_allclose(est_bounded["mu_i"], data.mean(), rtol=1e-4)
        assert_allclose(est_flat["mu_i"], data.mean(), rtol=1e-4)
        assert_allclose(est_bounded["mu_i"], est_flat["mu_i"], rtol=1e-4)

    def test_find_MAP_bounded_gradient_and_powell(self):
        """reference test_find_MAP: interval-bounded mu/sigma recover the
        standardized data's (0, 1) with and without gradients."""
        rng = np.random.default_rng(0)
        data = rng.normal(size=100)
        data = (data - data.mean()) / data.std()
        tol = 1e-3
        with pm.Model():
            mu = pm.Uniform("mu", -1, 1)
            sigma = pm.Uniform("sigma", 0.5, 1.5)
            pm.Normal("y", mu=mu, tau=sigma**-2, observed=data)
            est1 = pm.find_MAP(progressbar=False)
            est2 = pm.find_MAP(progressbar=False, method="Powell")
        assert_allclose(est1["mu"], 0, atol=tol)
        assert_allclose(est1["sigma"], 1, atol=tol)
        assert_allclose(est2["mu"], 0, atol=tol)
        assert_allclose(est2["sigma"], 1, atol=tol)

    def test_find_MAP_start_far(self):
        """reference test_find_MAP_issue_5923: converges from a start a
        reasonable distance from the MAP."""
        rng = np.random.default_rng(1)
        data = rng.normal(size=100)
        data = (data - data.mean()) / data.std()
        with pm.Model():
            mu = pm.Uniform("mu", -1, 1)
            sigma = pm.Uniform("sigma", 0.5, 1.5)
            pm.Normal("y", mu=mu, tau=sigma**-2, observed=data)
            est = pm.find_MAP(progressbar=False,
                              start={"mu": -0.5, "sigma": 1.25})
        assert_allclose(est["mu"], 0, atol=1e-3)
        assert_allclose(est["sigma"], 1, atol=1e-3)

    def test_find_MAP_imputed_issue_4488(self):
        """reference test_find_MAP_issue_4488: imputed entries appear in the
        estimate and deterministics evaluate at the MAP. Gamma(3, 10) mode
        is (alpha-1)/beta = 0.2 — exact only without the jacobian term."""
        with pm.Model():
            with pytest.warns(ImputationWarning):
                x = pm.Gamma("x", alpha=3.0, beta=10.0,
                             observed=np.array([1.0, np.nan]))
            pm.Deterministic("y", x + 1)
            est = pm.find_MAP(progressbar=False)
        assert {"x_unobserved", "y"} <= set(est.keys())
        assert_allclose(est["x_unobserved"], 0.2, rtol=1e-3, atol=1e-4)
        assert_allclose(est["y"], [2.0, float(np.ravel(est["x_unobserved"])[0]) + 1],
                        rtol=1e-5)

    def test_find_MAP_accuracy_point_start(self):
        """reference test_accuracy_normal: a far Point start still lands on
        the sample mean."""
        rng = np.random.default_rng(7)
        data = rng.normal(3.0, 1.0, size=200)
        with pm.Model():
            pm.Normal("x", 0.0, 100.0, shape=(2,))
            pm.Normal("y", pm.modelcontext(None)["x"], 1.0,
                      observed=np.stack([data, data], axis=-1))
            est = pm.find_MAP(start={"x": np.array([-10.5, 100.5])},
                              progressbar=False)
        assert_allclose(est["x"], [data.mean(), data.mean()], atol=1e-3)
