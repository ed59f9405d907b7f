"""Distribution machinery depth battery.

Ports reference tests/distributions/test_distribution.py: multivariate
batched logp shapes (issue #3051), check_bounds=False logp correctness
(issue #4499), DiracDelta contracts, and .dist() API validation.
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.graph import evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


class TestBugfixes:
    @pytest.mark.parametrize(
        "dist_cls, kwargs", [(pm.MvNormal, {}), (pm.MvStudentT, {"nu": 2})]
    )
    @pytest.mark.parametrize("dims", [1, 2, 4])
    def test_issue_3051_batched_mv_logp_shape(self, dims, dist_cls, kwargs):
        mu = np.zeros(dims)
        d = dist_cls.dist(mu=mu, cov=np.eye(dims), size=(20,), **kwargs)
        X = np.random.default_rng(0).normal(size=(20, dims))
        lp = _eval(d.logp(X))
        assert lp.shape == (20,)
        if dist_cls is pm.MvNormal:
            np.testing.assert_allclose(
                lp, st.multivariate_normal.logpdf(X, mu, np.eye(dims)),
                rtol=1e-8,
            )

    def test_issue_4499_check_bounds_false(self):
        with pm.Model(check_bounds=False) as m:
            pm.Uniform("x", 0, 2, size=10, default_transform=None)
        np.testing.assert_almost_equal(
            float(m.compile_logp()({"x": np.ones(10)})), -np.log(2) * 10
        )
        with pm.Model(check_bounds=False) as m:
            pm.DiscreteUniform("x", 0, 1, size=10)
        np.testing.assert_almost_equal(
            float(m.compile_logp()({"x": np.ones(10, int)})), -np.log(2) * 10
        )
        with pm.Model(check_bounds=False) as m:
            pm.DiracDelta("x", 1, size=10)
        np.testing.assert_almost_equal(
            float(m.compile_logp()({"x": np.ones(10, int)})), 0.0
        )

    def test_check_bounds_true_still_guards(self):
        with pm.Model() as m:
            pm.Normal("x", 0, -1.0)
        assert float(m.compile_logp()({"x": 0.0})) == -np.inf


class TestDiracDelta:
    def test_logp_logcdf(self):
        d = pm.DiracDelta.dist(3)
        assert float(pm.logp(d, 3)) == 0.0
        assert float(pm.logp(d, 2)) == -np.inf
        assert float(pm.logcdf(d, 2)) == -np.inf
        assert float(pm.logcdf(d, 3)) == 0.0
        assert float(pm.logcdf(d, 7)) == 0.0

    @pytest.mark.parametrize(
        "c, size, expected",
        [
            (1, None, 1),
            (1, (5,), np.full(5, 1)),
            (np.arange(1, 6), None, np.arange(1, 6)),
        ],
    )
    def test_support_point(self, c, size, expected):
        d = pm.DiracDelta.dist(c, size=size) if size else pm.DiracDelta.dist(c)
        np.testing.assert_array_equal(np.asarray(d.support_point()), expected)

    def test_draws_are_constant(self):
        draws = pm.draw(pm.DiracDelta.dist(3, size=(7,)), random_seed=1)
        np.testing.assert_array_equal(np.asarray(draws), np.full(7, 3))

    def test_dtype_follows_value(self):
        assert np.issubdtype(pm.DiracDelta.dist(2).dtype, np.integer)
        assert np.issubdtype(
            np.asarray(pm.draw(pm.DiracDelta.dist(2.5))).dtype, np.floating
        )


class TestDistAPIValidation:
    def test_shape_and_size_together_rejected(self):
        with pytest.raises(ValueError, match="shape.*size|size.*shape"):
            pm.Normal.dist(0, 1, shape=(2,), size=(2,))

    def test_named_path_requires_string_name(self):
        with pytest.raises(TypeError, match="must be a string"):
            pm.Normal(0, 1)

    def test_incompatible_param_shapes_raise(self):
        with pytest.raises(Exception, match="[Ii]ncompatible|broadcast"):
            pm.Normal.dist(np.zeros(3), np.ones(4))
