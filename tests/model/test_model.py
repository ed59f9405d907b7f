"""Model layer tests (mirrors reference tests/model/test_core.py,
test_fgraph.py, tests/model/transform/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm


@pytest.fixture
def basic_model():
    y = np.random.default_rng(0).normal(1.0, 1.0, 30)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 5)
        sigma = pm.HalfNormal("sigma", 2)
        pm.Deterministic("double_mu", 2 * mu)
        pm.Normal("y", mu, sigma, observed=y)
    return m, y


class TestModelCore:
    def test_logp_matches_scipy(self, basic_model):
        m, y = basic_model
        pt = {"mu": jnp.asarray(0.5), "sigma_log__": jnp.asarray(0.1)}
        sig = np.exp(0.1)
        expected = (
            st.norm.logpdf(0.5, 0, 5)
            + st.halfnorm.logpdf(sig, scale=2) + 0.1
            + st.norm.logpdf(y, 0.5, sig).sum()
        )
        np.testing.assert_allclose(float(m.compile_logp()(pt)), expected, rtol=1e-8)

    def test_logp_no_jacobian(self, basic_model):
        m, y = basic_model
        pt = {"mu": jnp.asarray(0.5), "sigma_log__": jnp.asarray(0.1)}
        with_j = float(m.compile_logp()(pt))
        without_j = float(m.compile_logp(jacobian=False)(pt))
        np.testing.assert_allclose(with_j - without_j, 0.1, rtol=1e-8)

    def test_point_logps(self, basic_model):
        m, _ = basic_model
        out = m.point_logps()
        assert set(out) == {"mu", "sigma", "y"}

    def test_potential(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
            pm.Potential("pen", -0.5 * x**2)
        lp = float(m.compile_logp()({"x": 1.0}))
        np.testing.assert_allclose(
            lp, st.norm.logpdf(1.0) - 0.5, rtol=1e-8
        )

    def test_nested_models(self):
        with pm.Model() as outer:
            a = pm.Normal("a", 0, 1)
            with pm.Model(name="sub"):
                b = pm.Normal("b", a, 1)
        assert "sub::b" in outer.named_vars
        assert len(outer.free_RVs) == 2

    def test_set_data_retraces(self):
        with pm.Model() as m:
            x = pm.Data("x", np.array([1.0, 2.0]))
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu * x.sum(), 1.0, observed=np.array([3.0]))
        lp1 = float(m.compile_logp()({"mu": 1.0}))
        m.set_data("x", np.array([2.0, 3.0]))
        lp2 = float(m.compile_logp()({"mu": 1.0}))
        np.testing.assert_allclose(lp1, st.norm.logpdf(1.0) + st.norm.logpdf(3.0, 3.0, 1.0))
        np.testing.assert_allclose(lp2, st.norm.logpdf(1.0) + st.norm.logpdf(3.0, 5.0, 1.0))

    def test_check_start_vals_raises(self):
        with pm.Model() as m:
            pm.Normal("x", 0, -1.0)
        with pytest.raises(pm.SamplingError):
            m.check_start_vals({"x": jnp.asarray(0.0)})


class TestModelTransforms:
    def test_clone_independent(self, basic_model):
        m, _ = basic_model
        m2 = pm.clone_model(m)
        pt = m.initial_point()
        np.testing.assert_allclose(
            float(m.compile_logp()(pt)), float(m2.compile_logp()(pt))
        )
        assert m2.named_vars["mu"] is not m.named_vars["mu"]

    def test_do(self, basic_model):
        m, y = basic_model
        m_do = pm.do(m, {"mu": 3.0})
        assert [rv.name for rv in m_do.free_RVs] == ["sigma"]
        sig = np.exp(0.0)
        lp = float(m_do.compile_logp()({"sigma_log__": 0.0}))
        expected = st.halfnorm.logpdf(1.0, scale=2) + 0.0 + st.norm.logpdf(
            y, 3.0, 1.0
        ).sum()
        np.testing.assert_allclose(lp, expected, rtol=1e-8)
        from pymc_tpu.graph import evaluate

        np.testing.assert_allclose(
            float(evaluate(m_do.named_vars["double_mu"], {})), 6.0
        )

    def test_observe(self):
        with pm.Model() as m:
            a = pm.Normal("a", 0, 1)
            b = pm.Normal("b", a, 1)
        m_obs = pm.observe(m, {"b": 2.0})
        assert [rv.name for rv in m_obs.free_RVs] == ["a"]
        lp = float(m_obs.compile_logp()({"a": 1.0}))
        np.testing.assert_allclose(
            lp, st.norm.logpdf(1.0) + st.norm.logpdf(2.0, 1.0, 1.0), rtol=1e-8
        )

    def test_change_value_transforms(self, basic_model):
        m, _ = basic_model
        m2 = pm.change_value_transforms(m, {"sigma": None})
        assert m2.free_RVs[1].value_name == "sigma"
        lp = float(m2.compile_logp()({"mu": 0.0, "sigma": 1.5}))
        assert np.isfinite(lp)

    def test_freeze(self):
        with pm.Model() as m:
            d = pm.Data("X", np.ones(3))
            pm.Normal("z", 0, 1, observed=np.ones(3))
        m2 = pm.freeze_dims_and_data(m)
        from pymc_tpu.graph import ConstantNode

        assert isinstance(m2.named_vars["X"], ConstantNode)

    def test_do_then_sample(self, basic_model):
        m, y = basic_model
        m_do = pm.do(m, {"sigma": 1.0})
        idata = pm.sample(draws=200, tune=200, chains=2, model=m_do,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False)
        exact = 30 * y.mean() / (30 + 1 / 25)
        assert abs(idata.posterior["mu"].values.mean() - exact) < 0.15


class TestImputation:
    def test_missing_data_sampling(self):
        rng = np.random.default_rng(5)
        y = rng.normal(2.0, 0.5, 50)
        y_missing = y.copy()
        y_missing[[3, 10, 20]] = np.nan
        with pytest.warns(pm.ImputationWarning):
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 5)
                pm.Normal("y", mu, 0.5, observed=y_missing)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=6, progressbar=False,
                          compute_convergence_checks=False)
        est = idata.posterior["y"].values.mean(axis=(0, 1))
        observed_idx = ~np.isnan(y_missing)
        np.testing.assert_allclose(est[observed_idx], y[observed_idx])
        # imputed entries near posterior mean of mu
        assert np.all(np.abs(est[~observed_idx] - 2.0) < 0.5)


class TestCompile:
    def test_compile_positional(self):
        with pm.Model():
            x = pm.Normal("x", 0, 1)
            d = pm.Deterministic("d", x * 2.0 + 1.0)
        f = pm.compile([x], [d])
        np.testing.assert_allclose(np.asarray(f(np.float32(3.0))[0]), 7.0)

    def test_compile_by_name_single_output(self):
        with pm.Model():
            x = pm.Normal("x", 0, 1)
            d = pm.Deterministic("d", x**2)
        g = pm.compile(["x"], d)
        np.testing.assert_allclose(float(g(np.float32(2.0))), 4.0)


def test_set_initval():
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 10)
    m.set_initval(mu, 7.5)
    assert float(np.asarray(m.initial_point()["mu"])) == 7.5
    m.set_initval("mu", None)
    assert float(np.asarray(m.initial_point()["mu"])) == 0.0
    with pytest.raises(KeyError):
        m.set_initval("nope", 1.0)
