"""Model-layer API contract expansion.

Mirrors behaviors from /root/reference/tests/model/test_core.py:
varlogp/datalogp split, subset/elementwise compiled logps, dlogp,
eval_rv_shapes, debug diagnostics, set_initval, jittered initial points,
double-nested model naming, coords mutation, Deterministic/Potential
bookkeeping.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import pymc_tpu as pm


@pytest.fixture
def model_and_point():
    data = np.array([0.5, -0.3, 1.2])
    with pm.Model() as m:
        mu = pm.Normal("mu", 0.0, 2.0)
        sd = pm.HalfNormal("sd", 1.0)
        pm.Normal("y", mu, sd, observed=data)
    pt = {"mu": 0.4, "sd_log__": np.log(0.8)}
    return m, pt, data


class TestLogpSplitAndSubsets:
    def test_varlogp_datalogp_split(self, model_and_point):
        m, pt, data = model_and_point
        varlogp, datalogp = m.logp_fn(split=True)(pt)
        expected_var = (
            st.norm.logpdf(0.4, 0, 2)
            + st.halfnorm.logpdf(0.8, scale=1.0) + np.log(0.8)  # jacobian
        )
        expected_data = st.norm.logpdf(data, 0.4, 0.8).sum()
        np.testing.assert_allclose(float(varlogp), expected_var, rtol=1e-6)
        np.testing.assert_allclose(float(datalogp), expected_data, rtol=1e-6)
        total = float(m.compile_logp()(pt))
        np.testing.assert_allclose(total, expected_var + expected_data,
                                   rtol=1e-6)

    def test_compile_logp_vars_subset(self, model_and_point):
        m, pt, data = model_and_point
        lp_y = float(m.compile_logp(vars=[m["y"]])(pt))
        np.testing.assert_allclose(
            lp_y, st.norm.logpdf(data, 0.4, 0.8).sum(), rtol=1e-6)

    def test_compile_logp_elementwise(self, model_and_point):
        m, pt, data = model_and_point
        lp = m.compile_logp(vars=[m["y"]], sum=False)(pt)
        arr = np.asarray(lp["y"]) if isinstance(lp, dict) else np.asarray(lp)
        np.testing.assert_allclose(
            arr.ravel(), st.norm.logpdf(data, 0.4, 0.8), rtol=1e-6)

    def test_compile_dlogp_matches_fd(self, model_and_point):
        m, pt, _ = model_and_point
        g = m.compile_dlogp()(pt)
        lp = m.compile_logp()
        eps = 1e-5
        for name in pt:
            p1 = dict(pt); p1[name] = pt[name] + eps
            p2 = dict(pt); p2[name] = pt[name] - eps
            fd = (float(lp(p1)) - float(lp(p2))) / (2 * eps)
            np.testing.assert_allclose(float(np.asarray(g[name])), fd,
                                       rtol=1e-4)

    def test_logp_no_jacobian_split(self, model_and_point):
        m, pt, data = model_and_point
        varlogp, _ = m.logp_fn(split=True, jacobian=False)(pt)
        expected = (
            st.norm.logpdf(0.4, 0, 2) + st.halfnorm.logpdf(0.8, scale=1.0)
        )
        np.testing.assert_allclose(float(varlogp), expected, rtol=1e-6)


class TestModelIntrospection:
    def test_eval_rv_shapes(self):
        with pm.Model(coords={"g": list("abc")}) as m:
            pm.Normal("x", 0, 1, dims="g")
            pm.MvNormal("z", mu=np.zeros(2), cov=np.eye(2))
            pm.Normal("y", 0, 1, observed=np.zeros((4, 2)))
        shapes = m.eval_rv_shapes()
        assert tuple(shapes["x"]) == (3,)
        assert tuple(shapes["z"]) == (2,)
        assert tuple(shapes["y"]) == (4, 2)

    def test_debug_finds_nonfinite(self, capsys):
        with pm.Model() as m:
            sd = pm.Normal("sd", 0, 1)  # can be negative
            pm.Normal("y", 0, sd, observed=np.zeros(3))
        problems = m.debug(point={"sd": -1.0})
        assert any("y" in k for k in problems)
        assert "non-finite" in capsys.readouterr().out

    def test_debug_clean(self, capsys):
        with pm.Model() as m:
            pm.Normal("x", 0, 1)
        assert m.debug() == {}
        assert "No problems" in capsys.readouterr().out

    def test_point_logps_keys(self, model_and_point):
        # reference point_logps reports under untransformed RV names
        m, pt, _ = model_and_point
        plps = m.point_logps(pt)
        assert set(plps) == {"mu", "sd", "y"}

    def test_str_repr_contains_vars(self, model_and_point):
        m, *_ = model_and_point
        r = m.str_repr()
        assert "mu ~ Normal" in r and "y ~ Normal" in r
        ltx = m._repr_latex_()
        assert r"\operatorname{Normal}" in ltx
        assert m["mu"].str_repr().startswith("mu ~ Normal(")
        assert m["mu"]._repr_latex_().startswith(r"$\text{mu} \sim")


class TestInitialPoints:
    def test_set_initval(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
            m.set_initval(x, 3.5)
        assert float(m.initial_point()["x"]) == 3.5

    def test_initval_kwarg_transformed(self):
        with pm.Model() as m:
            pm.HalfNormal("s", 1.0, initval=2.0)
        np.testing.assert_allclose(
            float(m.initial_point()["s_log__"]), np.log(2.0), rtol=1e-6)

    def test_jitter_varies_with_seed(self):
        with pm.Model() as m:
            pm.Normal("x", 0, 1)
        p1 = m.initial_point(random_seed=1, jitter=1.0)
        p2 = m.initial_point(random_seed=2, jitter=1.0)
        assert float(p1["x"]) != float(p2["x"])
        p0 = m.initial_point(jitter=0.0)
        assert float(p0["x"]) == 0.0


class TestNestedModels:
    def test_double_nesting_names(self):
        with pm.Model() as root:
            with pm.Model(name="outer"):
                with pm.Model(name="inner"):
                    x = pm.Normal("x", 0, 1)
        assert x.name == "outer::inner::x"
        assert "outer::inner::x" in root.named_vars
        assert root.free_RVs[0] is x

    def test_sibling_submodels_no_collision(self):
        with pm.Model() as root:
            with pm.Model(name="a"):
                pm.Normal("x", 0, 1)
            with pm.Model(name="b"):
                pm.Normal("x", 1, 1)
        assert {"a::x", "b::x"} <= set(root.named_vars)
        ip = root.initial_point()
        assert set(ip) == {"a::x", "b::x"}

    def test_deterministic_in_submodel_prefixed(self):
        with pm.Model() as root:
            with pm.Model(name="sub"):
                x = pm.Normal("x", 0, 1)
                pm.Deterministic("d", x * 2)
        assert "sub::d" in root.named_vars


class TestCoordsMutation:
    def test_add_coord_and_set_dim(self):
        with pm.Model() as m:
            m.add_coord("g", ["a", "b"])
            assert m.dim_lengths["g"] == 2
            m.set_dim("g", 3, coord_values=["a", "b", "c"])
            assert m.dim_lengths["g"] == 3
            assert list(m.coords["g"]) == ["a", "b", "c"]

    def test_add_coords_mapping(self):
        with pm.Model() as m:
            m.add_coords({"u": range(4)})
            assert m.dim_lengths["u"] == 4
            # a dim with neither values nor length is rejected (reference
            # add_coord contract)
            with pytest.raises(ValueError, match="values or length"):
                m.add_coords({"v": None})

    def test_duplicate_coord_value_mismatch(self):
        from pymc_tpu.exceptions import ShapeError
        with pm.Model() as m:
            m.add_coord("g", ["a", "b"])
            with pytest.raises(ShapeError, match="conflicting length"):
                m.add_coord("g", ["x", "y", "z"])


class TestPotentialAndDeterministic:
    def test_potential_shifts_logp(self):
        with pm.Model() as m1:
            pm.Normal("x", 0, 1)
        with pm.Model() as m2:
            x = pm.Normal("x", 0, 1)
            pm.Potential("pot", -0.5 * x ** 2)
        pt = {"x": 0.7}
        lp1 = float(m1.compile_logp()(pt))
        lp2 = float(m2.compile_logp()(pt))
        np.testing.assert_allclose(lp2 - lp1, -0.5 * 0.7 ** 2, rtol=1e-6)

    def test_deterministic_not_in_logp_but_in_draws(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
            d = pm.Deterministic("twice", 2 * x)
        assert all(d is not rv for rv in m.free_RVs)
        assert "twice" in m.named_vars
        val = pm.draw(d, random_seed=0)
        assert np.isfinite(float(np.asarray(val)))
