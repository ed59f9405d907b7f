"""Named-dimension broadcasting semantics of the pm.dims API.

Mirrors the reference's experimental dims-first layer
(pymc/dims/distributions/core.py:189 DimDistribution: dims declared or
inferred from parameters, name-aligned broadcasting; dims/model.py wrappers).
"""

import numpy as np
import pytest

import jax
import pymc_tpu as pm
from pymc_tpu.dims import DimVar, align, with_dims


@pytest.fixture
def coords():
    return {"a": list("xyz"), "b": list(range(4))}


class TestDimVarAlgebra:
    def test_binop_broadcasts_by_name(self, coords):
        with pm.Model(coords=coords):
            x = pm.dims.Normal("x", 0, 1, dims="a")
            w = pm.dims.Normal("w", 0, 1, dims="b")
            z = x * w
            assert isinstance(z, DimVar)
            assert z.dims == ("a", "b")
            assert z.shape == (3, 4)
            # evaluation realizes the outer product
            out = z.eval(point={"x": np.arange(3.0), "w": np.ones(4)})
            np.testing.assert_allclose(
                out, np.arange(3.0)[:, None] * np.ones(4)
            )

    def test_order_insensitive_addition(self, coords):
        with pm.Model(coords=coords):
            u = pm.dims.Normal("u", 0, 1, dims=("a", "b"))
            v = pm.dims.Normal("v", 0, 1, dims=("b", "a"))
            s = u + v
            assert s.dims == ("a", "b")
            ua = np.arange(12.0).reshape(3, 4)
            vb = np.arange(12.0).reshape(4, 3)
            out = s.eval(point={"u": ua, "v": vb})
            np.testing.assert_allclose(out, ua + vb.T)

    def test_scalar_mix_and_unnamed_error(self, coords):
        with pm.Model(coords=coords):
            x = pm.dims.Normal("x", 0, 1, dims="a")
            y = 2.0 * x + 1.0
            assert y.dims == ("a",)
            with pytest.raises(ValueError, match="unnamed"):
                x + np.ones(3)

    def test_reductions_by_name(self, coords):
        with pm.Model(coords=coords):
            z = pm.dims.Normal("z", 0, 1, dims=("a", "b"))
            s = z.sum(dim="b")
            assert isinstance(s, DimVar) and s.dims == ("a",)
            m = z.mean(dim=("a", "b"))
            assert not isinstance(m, DimVar)  # full reduction -> plain node
            vals = np.arange(12.0).reshape(3, 4)
            np.testing.assert_allclose(
                s.eval(point={"z": vals}), vals.sum(axis=1)
            )

    def test_transpose_rename_isel(self, coords):
        with pm.Model(coords=coords):
            z = pm.dims.Normal("z", 0, 1, dims=("a", "b"))
            t = z.transpose("b", "a")
            assert t.dims == ("b", "a") and t.shape == (4, 3)
            r = z.rename(a="alpha")
            assert r.dims == ("alpha", "b")
            row = z.isel(a=1)
            assert row.dims == ("b",) and row.shape == (4,)

    def test_dot_named_contraction(self, coords):
        with pm.Model(coords=coords):
            x = pm.dims.Normal("x", 0, 1, dims=("a", "b"))
            w = pm.dims.Normal("w", 0, 1, dims="b")
            y = x.dot(w, dim="b")
            assert y.dims == ("a",)
            xv = np.arange(12.0).reshape(3, 4)
            wv = np.arange(4.0)
            np.testing.assert_allclose(
                y.eval(point={"x": xv, "w": wv}), xv @ wv
            )


class TestDimDistributions:
    def test_param_aligned_by_name(self, coords):
        # mu carries dims ("a",); output declares ("b", "a"): the reference
        # aligns by NAME, not position
        with pm.Model(coords=coords) as m:
            mu = pm.dims.Normal("mu", 0, 1, dims="a")
            y = pm.dims.Normal("y", mu=mu, sigma=1.0, dims=("b", "a"))
            assert y.dims == ("b", "a")
            assert y.shape == (4, 3)
        # logp must see mu broadcast along b for each a
        pt = m.initial_point()
        lp = m.logp_fn()(pt)
        assert np.isfinite(float(lp))

    def test_dims_inferred_from_params(self, coords):
        with pm.Model(coords=coords):
            x = pm.dims.Normal("x", 0, 1, dims="a")
            w = pm.dims.Normal("w", 0, 1, dims="b")
            y = pm.dims.Normal("y", mu=x * w, sigma=1.0)  # no dims=
            assert y.dims == ("a", "b")

    def test_requires_dims_or_named_params(self, coords):
        with pm.Model(coords=coords):
            with pytest.raises(TypeError, match="dims"):
                pm.dims.Normal("x", 0, 1)

    def test_deterministic_from_dimvar(self, coords):
        with pm.Model(coords=coords) as m:
            x = pm.dims.Normal("x", 0, 1, dims="a")
            w = pm.dims.Normal("w", 0, 1, dims="b")
            d = pm.dims.Deterministic("d", x * w)
            assert d.dims == ("a", "b")
            assert m["d"].dims == ("a", "b")

    def test_data_wrapper(self, coords):
        with pm.Model(coords=coords):
            dat = pm.dims.Data("dat", np.ones((3, 4)), dims=("a", "b"))
            assert isinstance(dat, DimVar)
            assert dat.dims == ("a", "b")

    def test_end_to_end_sampling(self, coords):
        rng = np.random.default_rng(0)
        obs = rng.normal(1.0, 1.0, (4, 3))
        with pm.Model(coords=coords) as m:
            mu_a = pm.dims.Normal("mu_a", 0, 5, dims="a")
            pm.dims.Normal("obs", mu=mu_a, sigma=1.0, dims=("b", "a"),
                           observed=obs)
        idata = pm.sample(draws=200, tune=200, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        post = idata.posterior["mu_a"]
        assert post.values.shape[-1] == 3
        assert list(post.dims) == ["chain", "draw", "a"]
        np.testing.assert_allclose(
            post.values.mean(axis=(0, 1)), obs.mean(axis=0), atol=0.5
        )


class TestVectorDims:
    """Multivariate core dims (reference pymc/dims/distributions/vector.py):
    vector distributions take core_dims= naming their event dims; parameters
    align by name; the output carries batch + output-core dims."""

    @pytest.fixture
    def vcoords(self):
        return {"g": list("pq"), "d": list("abc"), "d2": list("ABC"),
                "c": list(range(4))}

    def test_mvnormal_core_dims(self, vcoords):
        cov = np.array([[1.0, 0.3, 0.1], [0.3, 1.0, 0.2], [0.1, 0.2, 1.0]])
        with pm.Model(coords=vcoords) as m:
            mu = pm.dims.Normal("mu", 0, 1, dims="d")
            x = pm.dims.MvNormal("x", mu=mu, cov=cov, core_dims=("d", "d2"))
            assert isinstance(x, DimVar)
            assert x.dims == ("d",)
        # logp matches the positional MvNormal
        val = np.array([0.3, -0.5, 1.1])
        muv = np.array([0.1, 0.0, -0.2])
        lp = m.logp_fn()({"mu": muv, "x": val})
        import scipy.stats as st

        expect = (
            st.multivariate_normal.logpdf(val, muv, cov)
            + st.norm.logpdf(muv).sum()
        )
        np.testing.assert_allclose(float(lp), expect, rtol=1e-5)

    def test_mvnormal_batched_named_cov(self, vcoords):
        # mu batched over g; cov given as a DimVar with its dims REVERSED —
        # name alignment must transpose it into (d, d2)
        cov = np.array([[1.0, 0.3, 0.1], [0.3, 1.0, 0.2], [0.1, 0.2, 1.0]])
        with pm.Model(coords=vcoords) as m:
            mu = pm.dims.Normal("mu", 0, 1, dims=("g", "d"))
            named_cov = pm.dims.with_dims(cov, ("d2", "d"))
            x = pm.dims.MvNormal("x", mu=mu, cov=named_cov,
                                 core_dims=("d", "d2"))
            assert x.dims == ("g", "d")
            assert x.shape == (2, 3)
        pt = m.initial_point()
        assert np.isfinite(float(m.logp_fn()(pt)))

    def test_mvnormal_requires_two_core_dims(self, vcoords):
        with pm.Model(coords=vcoords):
            with pytest.raises(ValueError, match="2 core_dims"):
                pm.dims.MvNormal("x", mu=np.zeros(3), cov=np.eye(3),
                                 core_dims="d")
            with pytest.raises(TypeError, match="core_dims"):
                pm.dims.MvNormal("y", mu=np.zeros(3), cov=np.eye(3))

    def test_mvnormal_rejects_stray_core_dim(self, vcoords):
        with pm.Model(coords=vcoords):
            mu_bad = pm.dims.Normal("mu_bad", 0, 1, dims="d2")
            with pytest.raises(ValueError, match="core dim"):
                pm.dims.MvNormal("x", mu=mu_bad, cov=np.eye(3),
                                 core_dims=("d", "d2"))

    def test_dirichlet_core_dims(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            a = pm.dims.with_dims(np.array([2.0, 1.0, 3.0, 0.5]), ("c",))
            w = pm.dims.Dirichlet("w", a=a, core_dims="c")
            assert w.dims == ("c",)
        draws = pm.draw(m["w"], draws=50, random_seed=1)
        np.testing.assert_allclose(np.sum(draws, axis=-1), 1.0, rtol=1e-5)

    def test_dirichlet_batched(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            a = pm.dims.Gamma("a", 2.0, 1.0, dims=("g", "c"))
            w = pm.dims.Dirichlet("w", a=a, core_dims="c")
            assert w.dims == ("g", "c")
            assert w.shape == (2, 4)
        pt = m.initial_point()
        assert np.isfinite(float(m.logp_fn()(pt)))

    def test_multinomial_core_dims(self, vcoords):
        p = np.array([0.2, 0.3, 0.4, 0.1])
        with pm.Model(coords=vcoords) as m:
            x = pm.dims.Multinomial(
                "x", n=10, p=pm.dims.with_dims(p, ("c",)), core_dims="c"
            )
            assert x.dims == ("c",)
        draws = pm.draw(m["x"], draws=30, random_seed=2)
        np.testing.assert_array_equal(np.sum(draws, axis=-1), 10)

    def test_categorical_absorbs_core_dim(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            p = pm.dims.Dirichlet(
                "p", a=np.ones(4), core_dims="c", dims=("g", "c")
            )
            y = pm.dims.Categorical("y", p=p, core_dims="c")
            # output keeps the batch dim g, DROPS the category dim c
            assert y.dims == ("g",)
            assert y.shape == (2,)

    def test_zerosum_core_dims(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            z = pm.dims.ZeroSumNormal("z", core_dims="d", dims=("g", "d"))
            assert z.dims == ("g", "d")
            assert z.shape == (2, 3)
        draws = pm.draw(m["z"], draws=40, random_seed=3)
        np.testing.assert_allclose(np.sum(draws, axis=-1), 0.0, atol=1e-5)

    def test_zerosum_two_core_dims(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            z = pm.dims.ZeroSumNormal("z", core_dims=("g", "d"))
            assert z.dims == ("g", "d")
        draws = pm.draw(m["z"], draws=20, random_seed=4)
        np.testing.assert_allclose(np.sum(draws, axis=-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sum(draws, axis=-2), 0.0, atol=1e-5)

    def test_censored_with_named_bounds(self, vcoords):
        with pm.Model(coords=vcoords) as m:
            lo = pm.dims.Normal("lo", -2.0, 0.1, dims="g")
            y = pm.dims.Censored(
                "y", pm.Normal.dist(0.0, 1.0), lower=lo, upper=2.0,
                dims=("g",),
            )
            assert isinstance(y, DimVar)
            assert y.dims == ("g",)
        pt = m.initial_point()
        assert np.isfinite(float(m.logp_fn()(pt)))

    def test_core_dim_length_inferred_from_param(self):
        # core dim length comes from the parameter when coords don't know it
        with pm.Model() as m:
            w = pm.dims.Dirichlet(
                "w", a=pm.dims.with_dims(np.ones(5), ("k",)), core_dims="k"
            )
            assert w.shape == (5,)
            assert m.dim_lengths["k"] == 5

    def test_mvnormal_sampling_end_to_end(self, vcoords):
        rng = np.random.default_rng(0)
        cov = np.array([[1.0, 0.5, 0.2], [0.5, 1.0, 0.3], [0.2, 0.3, 1.0]])
        obs = rng.multivariate_normal([1.0, -1.0, 0.5], cov, size=40)
        with pm.Model(coords={"d": list("abc"), "d2": list("ABC")}) as m:
            mu = pm.dims.Normal("mu", 0, 5, dims="d")
            pm.dims.MvNormal("y", mu=mu, cov=cov, core_dims=("d", "d2"),
                             observed=obs)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=0, progressbar=False,
                          compute_convergence_checks=False)
        post = idata.posterior["mu"]
        assert list(post.dims) == ["chain", "draw", "d"]
        np.testing.assert_allclose(
            post.values.mean(axis=(0, 1)), obs.mean(axis=0), atol=0.3
        )


class TestDimsEllipsis:
    """Ellipsis in dims specs (reference
    shape_utils.convert_dims_with_ellipsis + dims/distributions/core.py
    transpose-with-ellipsis: `...` stands for every remaining dim)."""

    def test_scalar_trailing_ellipsis(self, coords):
        with pm.Model(coords=coords):
            mu = pm.dims.Normal("mu", 0, 1, dims=("a", "b"))
            # "b" leads, ... fills with the remaining inferred dim "a"
            y = pm.dims.Normal("y", mu=mu, sigma=1.0, dims=("b", ...))
            assert y.dims == ("b", "a")
            assert tuple(y.shape) == (4, 3)

    def test_scalar_bare_ellipsis_is_inference(self, coords):
        with pm.Model(coords=coords):
            mu = pm.dims.Normal("mu", 0, 1, dims=("a", "b"))
            y = pm.dims.Normal("y", mu=mu, sigma=1.0, dims=...)
            assert y.dims == ("a", "b")

    def test_double_ellipsis_rejected(self, coords):
        with pm.Model(coords=coords):
            mu = pm.dims.Normal("mu", 0, 1, dims=("a", "b"))
            with pytest.raises(ValueError, match="at most one Ellipsis"):
                pm.dims.Normal("y", mu=mu, dims=(..., "a", ...))

    def test_vector_ellipsis_batch(self):
        coords = {"batch": list(range(5)), "d": list("pq"), "d2": list("PQ")}
        with pm.Model(coords=coords):
            mu = pm.dims.Normal("mu", 0, 1, dims=("batch", "d"))
            y = pm.dims.MvNormal(
                "y", mu=mu, cov=np.eye(2), core_dims=("d", "d2"),
                dims=(..., "d"),
            )
            assert y.dims == ("batch", "d")
            assert tuple(y.shape) == (5, 2)

    def test_ellipsis_from_observed_dims(self, coords):
        with pm.Model(coords=coords) as m:
            sd = pm.dims.HalfNormal("sd", 1.0, dims="a")
            obs = pm.dims.Data("obs", np.zeros((3, 4)), dims=("a", "b"))
            y = pm.dims.Normal("y", 0.0, sd, dims=...,
                               observed=obs)
            # inferred: param dim "a" first, then observed-only dim "b"
            assert tuple(y.shape) == (3, 4)
            lp = m.compile_logp()(m.initial_point())
            assert np.isfinite(float(lp))

    def test_observed_dimvar_transposed(self, coords):
        # observed carries (b, a); declared layout (a, b): the data must be
        # transposed into the declared order, not silently mismatched
        rng = np.random.default_rng(3)
        data = rng.normal(size=(4, 3))
        with pm.Model(coords=coords) as m:
            mu = pm.dims.Normal("mu", 0, 1, dims="a")
            obs = pm.dims.Data("obs", data, dims=("b", "a"))
            y = pm.dims.Normal("y", mu, 1.0, dims=("a", "b"), observed=obs)
            assert tuple(y.shape) == (3, 4)
        lp = m.compile_logp()(m.initial_point())
        # oracle: logp of transposed data under mu=0 start point
        import scipy.stats as st
        start = m.initial_point()
        expected = st.norm.logpdf(data.T, 0.0, 1.0).sum() + st.norm.logpdf(
            np.zeros(3)).sum()
        np.testing.assert_allclose(float(lp), expected, rtol=1e-6)


class TestAlignHelpers:
    def test_align_and_with_dims(self, coords):
        with pm.Model(coords=coords):
            z = pm.dims.Normal("z", 0, 1, dims=("a", "b"))
            a = align(z, ("b", "a"))
            assert tuple(a.shape) == (4, 3)
            w = with_dims(np.zeros((4, 3)), ("b", "a"))
            assert w.dims == ("b", "a")
            with pytest.raises(ValueError, match="not in the target"):
                align(z, ("a",))
