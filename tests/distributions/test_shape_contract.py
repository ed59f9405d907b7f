"""Shape / size / dims resolution contract.

Mirrors the user-facing behaviors of the reference's shape machinery tests
(/root/reference/tests/distributions/test_shape_utils.py: param-and-batch
shape combos:117, broadcast by dims:158, by observed:163, simultaneous
shape+dims:168, size+dims:180, dims+observed:193, resize data-defined
size:214, observed column vector:234, dist API:260, MvNormal shape-vs-size
difference:269, change_dist_size:388).
"""

import numpy as np
import pytest

import jax
import pymc_tpu as pm
from pymc_tpu.distributions.shape_utils import change_dist_size, to_tuple
from pymc_tpu.exceptions import ShapeError


class TestParamAndBatchShapeCombos:
    """shape= / size= interact with batched parameters like numpy
    broadcasting (reference test_param_and_batch_shape_combos)."""

    @pytest.mark.parametrize("param_shape", [(), (3,), (2, 3)])
    def test_natural_shape_follows_params(self, param_shape):
        mu = np.zeros(param_shape)
        d = pm.Normal.dist(mu=mu, sigma=1.0)
        assert d.shape == param_shape

    @pytest.mark.parametrize(
        "param_shape, shape",
        [((), (5,)), ((3,), (5, 3)), ((2, 3), (5, 2, 3))],
    )
    def test_shape_prepends_batch(self, param_shape, shape):
        d = pm.Normal.dist(mu=np.zeros(param_shape), shape=shape)
        assert d.shape == shape
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        assert draws.shape == shape

    def test_incompatible_shape_raises(self):
        with pytest.raises(ShapeError):
            pm.Normal.dist(mu=np.zeros(3), shape=(4,))

    def test_incompatible_param_broadcast_raises(self):
        with pytest.raises(ShapeError):
            pm.Normal.dist(mu=np.zeros(3), sigma=np.ones(4))

    def test_size_equals_shape_for_scalar_dists(self):
        d1 = pm.Gamma.dist(2.0, 1.0, size=(4, 2))
        d2 = pm.Gamma.dist(2.0, 1.0, shape=(4, 2))
        assert d1.shape == d2.shape == (4, 2)


class TestMvNormalShapeSizeDifference:
    """For multivariate dists `shape` includes the event dim; `size` is the
    batch shape only (reference test_mvnormal_shape_size_difference)."""

    def test_shape_includes_event(self):
        d = pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3), shape=(5, 3))
        assert d.batch_shape == (5,)
        assert d.event_shape == (3,)
        assert np.asarray(d.sample(jax.random.PRNGKey(0))).shape == (5, 3)

    def test_size_excludes_event(self):
        d = pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3), size=(5,))
        assert d.shape == (5, 3)

    def test_shape_event_mismatch_raises(self):
        with pytest.raises(ShapeError):
            pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3), shape=(5, 4))

    def test_batched_cov_natural_shape(self):
        cov = np.stack([np.eye(3), 2 * np.eye(3)])
        d = pm.MvNormal.dist(mu=np.zeros(3), cov=cov)
        assert d.shape == (2, 3)

    def test_dirichlet_size(self):
        d = pm.Dirichlet.dist(a=np.ones(4), size=(6,))
        assert d.shape == (6, 4)
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        np.testing.assert_allclose(draws.sum(-1), 1.0, rtol=1e-6)


class TestBroadcastingInModel:
    def test_broadcast_by_dims(self):
        # reference test_broadcast_by_dims: dims extend a scalar-param RV
        with pm.Model(coords={"g": list("abc")}) as m:
            x = pm.Normal("x", 0, 1, dims="g")
        assert x.dist.shape == (3,)
        assert m.named_vars_to_dims["x"] == ("g",)

    def test_broadcast_by_observed(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1, observed=np.zeros(7))
        assert tuple(np.asarray(x.observed).shape) == (7,)
        ip = m.initial_point()
        assert float(m.compile_logp()(ip)) == pytest.approx(
            7 * -0.5 * np.log(2 * np.pi), rel=1e-6
        )

    def test_simultaneous_shape_and_dims(self):
        # reference test_simultaneous_shape_and_dims: both given, consistent
        with pm.Model(coords={"g": list("abc")}) as m:
            x = pm.Normal("x", 0, 1, shape=(3,), dims="g")
        assert x.dist.shape == (3,)
        assert m.named_vars_to_dims["x"] == ("g",)

    def test_simultaneous_size_and_dims(self):
        with pm.Model(coords={"g": list("abcd")}) as m:
            x = pm.Normal("x", 0, 1, size=(4,), dims="g")
        assert x.dist.shape == (4,)
        assert m.named_vars_to_dims["x"] == ("g",)

    def test_simultaneous_dims_and_observed(self):
        with pm.Model(coords={"g": list("ab")}) as m:
            x = pm.Normal("x", 0, 1, dims="g", observed=np.zeros(2))
        assert m.named_vars_to_dims["x"] == ("g",)

    def test_unknown_dim_raises(self):
        with pm.Model():
            with pytest.raises(KeyError, match="dimension"):
                pm.Normal("x", 0, 1, dims="nope")

    def test_observed_with_column_vector(self):
        # reference test_observed_with_column_vector: (N, 1) data must keep
        # its trailing unit axis, not be squeezed
        with pm.Model() as m:
            sd = pm.HalfNormal("sd", 1.0)
            pm.Normal("y", 0, sd, observed=np.zeros((4, 1)))
        assert tuple(m["y"].dist.shape) in [(), (4, 1)]
        assert tuple(np.asarray(m["y"].observed).shape) == (4, 1)


class TestResizeDataDefinedShape:
    def test_set_data_resizes_rv(self):
        # reference test_can_resize_data_defined_size via shape=x.shape
        with pm.Model() as m:
            x = pm.Data("x", np.zeros(3))
            y = pm.Normal("y", mu=x, shape=x.shape)
            assert y.dist.shape == (3,)
            pm.set_data({"x": np.zeros(5)}, model=m)
            draws = pm.draw(y, random_seed=1)
        assert np.asarray(draws).shape == (5,)

    def test_prior_predictive_after_resize(self):
        rng = np.random.default_rng(0)
        with pm.Model() as m:
            x = pm.Data("x", rng.normal(size=4))
            b = pm.Normal("b", 0, 1)
            mu = pm.Deterministic("mu", b * x)
            pm.Normal("y", mu=mu, sigma=1.0, shape=x.shape)
            pm.set_data({"x": rng.normal(size=9)}, model=m)
            pp = pm.sample_prior_predictive(draws=11, model=m,
                                            random_seed=1)
        assert pp.prior["y"].values.shape == (1, 11, 9)


class TestChangeDistSize:
    """reference test_change_rv_size / change_dist_size."""

    def test_resize(self):
        d = pm.Normal.dist(mu=1.5, sigma=2.0, size=(3,))
        d2 = change_dist_size(d, (5, 3))
        assert d2.shape == (5, 3)
        assert float(np.asarray(d2.mu)) == 1.5

    def test_expand(self):
        d = pm.Normal.dist(size=(3,))
        d2 = change_dist_size(d, (2,), expand=True)
        assert d2.shape == (2, 3)

    def test_multivariate_keeps_event(self):
        d = pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3))
        d2 = change_dist_size(d, (4,))
        assert d2.shape == (4, 3)

    def test_scalar_new_size(self):
        d = pm.Poisson.dist(3.0, size=(7,))
        d2 = change_dist_size(d, 2)
        assert d2.shape == (2,)


def test_to_tuple():
    assert to_tuple(None) == ()
    assert to_tuple(3) == (3,)
    assert to_tuple((2, 3)) == (2, 3)
    assert to_tuple([4]) == (4,)
    assert to_tuple(np.int64(5)) == (5,)


class TestLazyAndInvalidFlavors:
    def test_explicit_none_shape_size(self):
        # reference test_explicit_size_shape_none
        d = pm.Normal.dist(mu=np.zeros(3), shape=None)
        assert d.shape == (3,)
        d = pm.Normal.dist(mu=np.zeros(3), size=None)
        assert d.shape == (3,)

    def test_shape_and_size_together_rejected(self):
        with pytest.raises((TypeError, ValueError)):
            pm.Normal.dist(0.0, 1.0, shape=(3,), size=(3,))
