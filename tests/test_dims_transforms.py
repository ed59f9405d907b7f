"""Dim-named value transforms (pm.dims.transforms).

Parity: reference pymc/dims/distributions/transforms.py — DimTransform,
log_transform, log_odds_transform, IntervalTransform, SimplexTransform(dim),
ZeroSumTransform(dims). Here a DimTransform resolves against the RV's
declared dims into a positional transform (axes moved to trailing).
"""

import numpy as np
import pytest

import pymc_tpu as pm
from pymc_tpu.dims import transforms as dtr
from pymc_tpu.distributions import transforms as ptr


class TestElementwise:
    def test_log_transform_is_positional_log(self):
        assert isinstance(dtr.log_transform, ptr.LogTransform)
        assert dtr.log_transform.resolve(("a",)) is dtr.log_transform

    def test_log_odds(self):
        t = dtr.log_odds_transform
        v = np.linspace(-2, 2, 5)
        np.testing.assert_allclose(
            np.asarray(t.backward(v)), 1 / (1 + np.exp(-v)), rtol=1e-6
        )

    def test_interval_in_model(self):
        with pm.Model(coords={"a": range(3)}) as m:
            pm.dims.Uniform("u", 1.0, 3.0, dims="a",
                            transform=dtr.IntervalTransform(1.0, 3.0))
        ip = m.initial_point()
        assert "u_interval__" in ip
        assert np.isfinite(m.compile_logp()(ip))


class TestZeroSum:
    def test_trailing_dim_resolves_to_positional(self):
        t = dtr.ZeroSumTransform(dims="a").resolve(("b", "a"))
        assert isinstance(t, ptr.ZeroSumTransform)
        assert t.n_zerosum_axes == 1

    def test_leading_dim_zero_sum_constraint(self):
        """zero-sum over a NON-trailing named dim: backward output sums to
        zero along that axis and forward inverts backward."""
        t = dtr.ZeroSumTransform(dims="a").resolve(("a", "b"))
        rng = np.random.default_rng(0)
        v = rng.normal(size=(4, 3))  # value space: a reduced 5 -> 4
        x = np.asarray(t.backward(v))
        assert x.shape == (5, 3)
        np.testing.assert_allclose(x.sum(axis=0), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-5,
                                   atol=1e-6)
        assert t.value_shape((5, 3)) == (4, 3)
        assert t.constrained_shape((4, 3)) == (5, 3)

    def test_model_logp_matches_permuted_layout(self):
        """Normal with zero-sum over the leading dim == the same model built
        with the positional trailing transform on the transposed layout."""
        val = np.random.default_rng(1).normal(size=(4, 3))
        with pm.Model(coords={"a": range(5), "b": range(3)}) as m1:
            pm.dims.Normal("x", 0.0, 1.0, dims=("a", "b"),
                           transform=dtr.ZeroSumTransform(dims="a"))
        with pm.Model(coords={"a": range(5), "b": range(3)}) as m2:
            pm.dims.Normal("x", 0.0, 1.0, dims=("b", "a"),
                           transform=dtr.ZeroSumTransform(dims="a"))
        lp1 = float(m1.compile_logp()({"x_zerosum__": val}))
        lp2 = float(m2.compile_logp()({"x_zerosum__": val.T}))
        np.testing.assert_allclose(lp1, lp2, rtol=1e-6)

    def test_two_named_dims(self):
        t = dtr.ZeroSumTransform(dims=("a", "c")).resolve(("a", "b", "c"))
        rng = np.random.default_rng(2)
        v = rng.normal(size=(3, 2, 4))  # a: 4->3, c: 5->4
        x = np.asarray(t.backward(v))
        assert x.shape == (4, 2, 5)
        np.testing.assert_allclose(x.sum(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(x.sum(axis=2), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-5,
                                   atol=1e-6)

    def test_unknown_dim_raises(self):
        with pytest.raises(KeyError, match="nope"):
            dtr.ZeroSumTransform(dims="nope").resolve(("a", "b"))

    def test_duplicate_dims_raise(self):
        with pytest.raises(ValueError, match="duplicate"):
            dtr.ZeroSumTransform(dims=("a", "a"))


class TestSimplex:
    def test_trailing_is_positional(self):
        t = dtr.SimplexTransform(dim="k").resolve(("b", "k"))
        assert isinstance(t, ptr.SimplexTransform)

    def test_leading_dim_simplex(self):
        t = dtr.SimplexTransform(dim="k").resolve(("k", "b"))
        rng = np.random.default_rng(3)
        v = rng.normal(size=(3, 2))  # k: 4 categories -> 3 values
        x = np.asarray(t.backward(v))
        assert x.shape == (4, 2)
        np.testing.assert_allclose(x.sum(axis=0), 1.0, rtol=1e-6)
        assert np.all(x > 0)
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-5,
                                   atol=1e-6)
        assert t.value_shape((4, 2)) == (3, 2)
        assert t.constrained_shape((3, 2)) == (4, 2)

    def test_dirichlet_core_dim_transform(self):
        with pm.Model(coords={"k": range(4)}) as m:
            pm.dims.Dirichlet("w", a=np.ones(4), core_dims="k",
                              transform=dtr.SimplexTransform(dim="k"))
        ip = m.initial_point()
        (vname,) = [k for k in ip if k.startswith("w")]
        assert ip[vname].shape == (3,)
        assert np.isfinite(m.compile_logp()(ip))

    def test_dim_must_be_string(self):
        with pytest.raises(TypeError, match="NAME"):
            dtr.SimplexTransform(dim=0)


class TestSampling:
    def test_zerosum_posterior_respects_constraint(self):
        with pm.Model(coords={"a": range(4)}) as m:
            pm.dims.Normal("x", 0.0, 1.0, dims="a",
                           transform=dtr.ZeroSumTransform(dims="a"))
            idata = pm.sample(draws=50, tune=50, chains=2, random_seed=1,
                              progressbar=False,
                              compute_convergence_checks=False)
        x = idata.posterior["x"].values
        np.testing.assert_allclose(x.sum(axis=-1), 0.0, atol=1e-5)
