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
