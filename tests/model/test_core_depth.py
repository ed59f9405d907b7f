"""Model-core depth battery.

Ports the case inventory of reference tests/model/test_core.py
(TestBaseModel:93, TestNested:169, TestObserved:255, test_duplicate_vars:273,
test_multiple_observed_rv:482, test_tempered_logp_dlogp:498,
test_model_value_vars:577, TestTransformArgs:604, d2logp:1133,
thread safety:1490, mixed contexts:1534) with this project's own oracles.
"""

import threading

import numpy as np
import pytest
import scipy.stats as st

import jax.numpy as jnp

import pymc_tpu as pm


class NewModel(pm.Model):
    """reference tests/model/test_core.py:70 class-based model."""

    def __init__(self, name="", model=None):
        super().__init__(name, model=model)
        assert pm.modelcontext(None) is self
        self.register_rv(pm.Normal.dist(), "v1")
        v2 = pm.Normal("v2", mu=0, sigma=1)
        pm.Deterministic("d", v2 * 2.0)
        pm.Potential("p", v2 * 0.0)


class TestClassBasedModels:
    def test_context_passes_vars_to_parent_model(self):
        with pm.Model() as model:
            assert pm.modelcontext(None) is model
            NewModel()
            assert pm.Model.get_context() is model
            usermodel2 = NewModel(name="another")
            assert pm.Model.get_context() is model
            assert usermodel2.parent is model
            with usermodel2:
                usermodel2.register_rv(pm.Normal.dist(), "v3")
                pm.Normal("v4")
        assert "another::v2" in model.named_vars
        assert "another::v3" in model.named_vars
        assert "another::v4" in model.named_vars
        # local-name attribute access on the submodel
        assert usermodel2.v2 is model.named_vars["another::v2"]
        assert usermodel2.v3 is model.named_vars["another::v3"]
        assert usermodel2.v4 is model.named_vars["another::v4"]

    def test_nest_context_works(self):
        with pm.Model() as m:
            new = NewModel()
            with new:
                assert pm.modelcontext(None) is new
            assert pm.modelcontext(None) is m
        assert "v1" in m.named_vars
        assert "v2" in m.named_vars

    def test_named_context(self):
        with pm.Model() as m:
            NewModel(name="new")
        assert "new::v1" in m.named_vars
        assert "new::v2" in m.named_vars

    def test_duplicates_detection(self):
        with pm.Model():
            NewModel(name="prefix")
            with pytest.raises(ValueError):
                NewModel(name="prefix")

    def test_setattr_and_value_vars(self):
        with pm.Model() as model:
            pm.Normal("v1")
            assert len(model.value_vars) == 1
            with pm.Model("sub") as submodel:
                submodel.register_rv(pm.Normal.dist(), "v1")
                assert submodel.v1 is not None
                assert "sub::v1" in model.named_vars
            assert len(model.value_vars) == 2


class TestNestedNaming:
    def test_model_root(self):
        with pm.Model() as model:
            assert model is model.root
            with pm.Model() as sub:
                assert model is sub.root

    def test_prefix_add_uses_separator(self):
        with pm.Model("foo"):
            foobar = pm.Normal("foobar")
            assert foobar.name == "foo::foobar"

    def test_nested_named_model_repeated(self):
        with pm.Model("sub") as model:
            pm.Normal("var")
            with pm.Model("sub"):
                pm.Normal("var")
        assert {"sub::var", "sub::sub::var"} == set(model.named_vars.keys())

    def test_nested_named_model(self):
        with pm.Model("sub1") as model:
            pm.Normal("var")
            with pm.Model("sub2"):
                pm.Normal("var")
        assert {"sub1::var", "sub1::sub2::var"} == set(model.named_vars.keys())

    def test_bad_name(self):
        with pm.Model():
            with pytest.raises(KeyError):
                pm.Normal("var::")
        with pytest.raises(KeyError):
            with pm.Model("scope::"):
                pm.Normal("v")

    def test_variable_name_with_slash(self):
        with pm.Model():
            with pytest.raises(ValueError, match="cannot contain '/'"):
                pm.Normal("a/b")


class TestObservedContracts:
    def test_observed_rv_fail(self):
        with pytest.raises(TypeError):
            with pm.Model():
                x = pm.Normal("x")
                pm.Normal("n", observed=x)

    def test_observed_rv_expression_fail(self):
        with pytest.raises(TypeError):
            with pm.Model():
                x = pm.Normal("x")
                pm.Normal("n", observed=x + 1.0)

    def test_multiple_observed_rv(self):
        with pm.Model() as model:
            mu = pm.Normal("mu")
            x = pm.CustomDist(
                "x", mu,
                logp=lambda value, mu: pm.Normal.logp(value, mu, 1.0),
                observed=0.1,
            )
        assert model["x"] is not model["mu"]
        assert model["x"] in model.observed_RVs
        assert "x" not in model.value_vars
        assert "mu" in model.value_vars


def test_duplicate_vars():
    """reference test_duplicate_vars: every same-name redefinition path."""
    with pytest.raises(ValueError, match="already exists"):
        with pm.Model():
            pm.Normal("a")
            pm.Normal("a")
    with pytest.raises(ValueError, match="already exists"):
        with pm.Model():
            pm.Normal("a")
            pm.Normal("a", default_transform=pm.distributions.transforms.log)
    with pytest.raises(ValueError, match="already exists"):
        with pm.Model():
            a = pm.Normal("a")
            pm.Potential("a", a**2)
    with pytest.raises(ValueError, match="already exists"):
        with pm.Model():
            pm.Binomial("a", 10, 0.5)
            pm.Normal("a")


def test_model_value_vars():
    with pm.Model() as model:
        a = pm.Normal("a")
        pm.Normal("x", a)
    assert len(model.value_vars) == 2
    assert set(model.value_vars) == {"a", "x"}
    with pm.Model() as model:
        pm.HalfNormal("s")
    assert model.value_vars == ["s_log__"]


def test_tempered_logp_dlogp():
    """reference test_tempered_logp_dlogp: tempered = varlogp + w*datalogp
    (datalogp includes potentials); w=1 is the full density, w=0 the prior."""
    with pm.Model() as model:
        pm.Normal("x")
        pm.Normal("y", model.x, 1.0, observed=1.0)
        pm.Potential("z", jnp.asarray(-1.0))

    full = model.logp_dlogp_fn()
    temp = model.tempered_logp_dlogp_fn()
    q = np.ones(1)
    f, g = full(q)
    t1, gt1 = temp(q, 1.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(t1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gt1), rtol=1e-6)
    # w=0: prior-only. x=1 under N(0,1):
    t0, gt0 = temp(q, 0.0)
    np.testing.assert_allclose(np.asarray(t0), st.norm.logpdf(1.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gt0), [-1.0], rtol=1e-6)
    # w=0.5 interpolates linearly
    t5, _ = temp(q, 0.5)
    np.testing.assert_allclose(
        np.asarray(t5), 0.5 * (np.asarray(t0) + np.asarray(t1)), rtol=1e-6
    )


class TestD2Logp:
    """reference test_model_d2logp: dense Hessian with/without jacobian."""

    def test_gaussian_hessian(self):
        with pm.Model() as model:
            pm.Normal("x", 0.0, 2.0)
            pm.Normal("y", model.x, 1.0, observed=[1.0, 2.0])
        pt = {"x": np.array(0.5)}
        h = model.compile_d2logp()(pt)
        # d2/dx2 [ -x^2/8 - sum (y-x)^2/2 ] = -1/4 - 2
        np.testing.assert_allclose(np.asarray(h), [[-2.25]], rtol=1e-6)
        hn = model.compile_d2logp(negate_output=True)(pt)
        np.testing.assert_allclose(np.asarray(hn), [[2.25]], rtol=1e-6)

    def test_jacobian_toggle(self):
        with pm.Model() as model:
            pm.HalfNormal("s", 1.0)
        v = {"s_log__": np.array(0.3)}
        h_j = np.asarray(model.compile_d2logp(jacobian=True)(v))
        h_nj = np.asarray(model.compile_d2logp(jacobian=False)(v))
        # jacobian term log|exp'(v)| = v contributes 0 to the Hessian of v
        # BUT the density term differs; check against autodiff of scipy form
        s = np.exp(0.3)
        # logp(s) + log s (jacobian); d2/dv2 of [-s^2/2 + const + v] where
        # s = e^v: d/dv(-s^2) /2 = -s^2 ; d2 = -2 s^2
        np.testing.assert_allclose(h_j, [[-2 * s**2]], rtol=1e-5)
        np.testing.assert_allclose(h_nj, h_j, rtol=1e-5)

    def test_multivar_hessian_block(self):
        with pm.Model() as model:
            pm.Normal("a", 0.0, 1.0, shape=(2,))
            pm.Normal("b", 0.0, 1.0)
        h = np.asarray(model.compile_d2logp()(
            {"a": np.zeros(2), "b": np.array(0.0)}
        ))
        np.testing.assert_allclose(h, -np.eye(3), atol=1e-8)


class TestModelContextThreading:
    """reference TestModelContext.test_thread_safety: the context stack is
    thread-local."""

    def test_thread_safety(self):
        results = {}

        def make_model(i):
            with pm.Model() as m:
                pm.Normal(f"x{i}")
                results[i] = (m, pm.modelcontext(None))

        threads = [
            threading.Thread(target=make_model, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        for i, (m, ctx) in results.items():
            assert ctx is m
            assert list(m.named_vars) == [f"x{i}"]

    def test_mixed_contexts(self):
        """reference test_mixed_contexts: modelcontext resolves the nearest
        Model even through nested enters/exits."""
        with pm.Model() as m1:
            with pm.Model() as m2:
                assert pm.modelcontext(None) is m2
            assert pm.modelcontext(None) is m1
        with pytest.raises(TypeError):
            pm.modelcontext(None)


def test_empty_model_logp_and_repr():
    """reference test_empty_model_representation + point_logps on empties."""
    with pm.Model() as model:
        pass
    assert model.free_RVs == []
    s = str(model)
    assert isinstance(s, str)
